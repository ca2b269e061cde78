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

  /** Exact-profile variant with HLL distinct counts (no Expand — every
    * aggregate is a plain accumulate/merge, one pass at any width).
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c)))

  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n_rows") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c").mkString(", ")
    one.select(col("__n_rows"),
      expr(s"stack(${cols.size}, $stacked) AS (column_name, n_nonnull, n_distinct)"))
      .select(col("column_name"), col("__n_rows").as("n_rows"),
        col("n_nonnull"), col("n_distinct"))
  }
}
