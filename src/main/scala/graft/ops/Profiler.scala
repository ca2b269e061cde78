package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: per-column row/non-null/distinct counts — the
  * "describe my table" primitive every ingest pipeline runs before trusting
  * a new feed.
  *
  * Shape: a single wide aggregate (2 plain + 1 distinct aggregate per
  * column) followed by a stack() unpivot of the one-row result. Multiple
  * COUNT(DISTINCT) in one agg makes Catalyst plan an Expand (one duplicate
  * of each input row per distinct column) — one shuffle, input×|cols|
  * expanded rows with partial aggregation before it. At 100 TB profile in
  * column groups (or swap exact distinct for approx_count_distinct — see
  * [[approxProfile]]) rather than one giant Expand.
  */
object Profiler {

  /** (column, n_rows, n_nonnull, n_distinct) per profiled column; exact. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** Approximate-profile variant with HLL distinct counts (no Expand —
    * every aggregate is a plain accumulate/merge, one pass at any width).
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c)))

  /** Internal aliases are positional (`__nn_0`), never derived from the
    * column NAME: splicing raw names into aliases / the stack() SQL breaks
    * on quotes, dots, spaces — and is an injection surface for untrusted
    * names (ADVICE r3). Names enter the generated SQL only as escaped
    * string literals; the data columns are referenced positionally.
    */
  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        count(col(c)).as(s"__nn_$i"),
        distinctAgg(c).as(s"__nd_$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    def sqlLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      s"${sqlLit(c)}, __nn_$i, __nd_$i" }.mkString(", ")
    one.select(col("__n_rows"),
      expr(s"stack(${cols.size}, $stacked) AS (column_name, n_nonnull, n_distinct)"))
      .select(col("column_name"), col("__n_rows").as("n_rows"),
        col("n_nonnull"), col("n_distinct"))
  }
}
