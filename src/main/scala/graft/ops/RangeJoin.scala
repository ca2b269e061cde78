package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins — an operator family Spark has no native physical
  * strategy for: a plain `a.join(b, p >= lo && p < hi)` plans as a
  * nested-loop join, O(|a|·|b|) comparisons at scale.
  *
  * Strategy here: BUCKETIZE. Intervals explode to one row per fixed-width
  * bucket they cover; points map to their single bucket; the join becomes an
  * equi-join on the bucket id (hash join — shuffled or broadcast, partial
  * and parallel like any other equi-join) followed by the exact residual
  * predicate. Cost shifts from |a|·|b| to |a| + Σ interval widths/bucket —
  * pick `bucketWidth` near the median interval width so most intervals
  * explode to 1-2 rows.
  *
  * This is the standard range-join decomposition (cf. Databricks' range
  * join optimization and the bucketed as-of join in ops.AsOf).
  */
object RangeJoin {

  /** Join `points` (value `pointCol`) to `intervals` (half-open
    * [`loCol`, `hiCol`)) where lo <= p < hi. Both sides may carry extra
    * columns; output = point columns + interval columns. Intervals may
    * overlap — a point matches every covering interval.
    *
    * @param bucketWidth fixed bucket width in the value's own unit; must be
    *        positive. Every interval is exploded to ceil(width/bucketWidth)
    *        (+1 boundary) bucket rows — keep it near the median interval
    *        width.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bucketOf: Column => Column = c => floor(c / lit(bucketWidth)).cast("long")
    val ptsB = points.withColumn("__bucket", bucketOf(col(pointCol)))
    // hi is exclusive: an interval ending exactly on a bucket boundary does
    // not cover that bucket — subtract one ulp via the half-open floor on
    // (hi - tiny)? No: integer bucket of the last covered point is
    // floor((hi - epsilon)/w); for half-open intervals the last covered
    // bucket is the bucket of the largest value < hi, which for continuous
    // values is floor(hi/w) (minus 1 only when hi is an exact boundary).
    // Exploding to floor(hi/w) unconditionally is correct and at most one
    // extra empty bucket — the residual predicate discards strays.
    val intsB = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    ptsB.join(intsB, Seq("__bucket"), "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
