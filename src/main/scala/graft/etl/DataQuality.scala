package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (dbt-test style): each check names a
  * DataFrame of VIOLATING rows; the report is one row per check with its
  * violation count. Zero is a pass — the report is the artifact a pipeline
  * gates on (fail the run if any n_violations > 0).
  *
  * Shape: each check is an independent aggregate (its own pushed-down scan
  * — a duplicate-key check reads one column, an orphan check is a
  * broadcast anti-join); the final union is |checks| single-row frames.
  * Checks run as separate jobs, so at 100 TB they parallelize across the
  * cluster scheduler rather than serializing into one monolithic plan.
  */
object DataQuality {

  final case class Check(name: String, violations: DataFrame)

  /** Uniqueness: rows whose key appears more than once. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__cnt", count(lit(1)).over(w)).filter(col("__cnt") > 1).drop("__cnt")
  }

  /** Referential integrity: child rows whose key has no parent (anti-join —
    * broadcast when the parent is a dimension).
    *
    * A NULL child key is NOT an orphan by default — SQL foreign-key
    * semantics (a null FK satisfies the constraint), and what the oracle's
    * `NOT IN` replay computes anyway (NULL NOT IN ... is UNKNOWN). The
    * anti-join used to count it because a null key matches nothing
    * (round-10 sweep). BEHAVIOR CHANGE in r10 for callers that relied on
    * null keys being flagged (ADVICE r10): pass `nullsAsOrphans = true`
    * to restore the pre-r10 count (equivalent to this check plus a
    * not-null completeness check on the FK column).
    */
  def orphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      nullsAsOrphans: Boolean = false): DataFrame = {
    val base = if (nullsAsOrphans) child else child.filter(child(childKey).isNotNull)
    base.join(parent.select(col(parentKey)),
      child(childKey) === parent(parentKey), "left_anti")
  }

  /** Accepted values: rows whose column falls outside the allowed set. */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(!col(c).isin(allowed: _*) || col(c).isNull)

  /** (check_name, n_violations), one row per check. An empty check list is
    * a caller bug (a gate that can never fail), so it fails loudly here
    * rather than as reduce's opaque UnsupportedOperationException.
    */
  def report(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.map { c =>
      c.violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(c.name).as("check_name"), col("n_violations"))
    }.reduce(_ unionByName _)
  }
}
