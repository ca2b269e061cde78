package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distribution analytics: exact equi-depth bucketing and largest-remainder
  * quota allocation — the two workhorses behind dataset sharding and
  * mixture sampling in a training-data pipeline.
  */
object Distribution {

  /** Exact equi-depth buckets: global rank → `floor(rank·n/N)+1`, then one
    * aggregate per bucket (count, min, max). `orderCols` must be a TOTAL
    * order or the ranks (and thus boundary-bucket membership) are
    * nondeterministic.
    *
    * Scale shape: the global rank comes from `orderBy` (a range-partitioned
    * distributed sort — every partition holds a contiguous rank slice) plus
    * `zipWithIndex` (one extra count job for partition offsets). No
    * single-partition window — `ntile()` over a global ORDER BY collapses
    * the whole table into one task; this shape keeps all 3 jobs (count,
    * offsets, aggregate) fully parallel. Bucket arithmetic is pure integer,
    * so every engine places every row identically.
    */
  def equiDepthBuckets(df: DataFrame, valueCol: Column, orderCols: Seq[Column],
      n: Int = 10): DataFrame = {
    require(n >= 2, s"n=$n buckets must be at least 2")
    val spark = df.sparkSession
    // total order: value first, caller tie-breakers after
    val totalSorted = df.select((valueCol.as("v") +: orderCols.zipWithIndex
      .map { case (c, i) => c.as(s"t$i") }): _*)
      .orderBy(col("v") +: orderCols.indices.map(i => col(s"t$i")): _*)
    val total = totalSorted.count()
    val schema = totalSorted.schema.add("rank0", LongType)
    val ranked = spark.createDataFrame(
      totalSorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    ranked
      // `div` (floor division on longs) — `/` would promote to double
      .withColumn("bucket", expr(s"rank0 * $n div $total + 1"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("min_v"), max(col("v")).as("max_v"))
  }

  /** Exact per-group ranks WITHOUT a per-group window: a single
    * range-partitioned sort on (group, value, ties) + `zipWithIndex` gives
    * a global contiguous index in which each group's rows are contiguous;
    * subtracting the group's cumulative offset (a window over the TINY
    * per-group-count frame) yields the 1-based in-group rank.
    *
    * Why: `row_number().over(partitionBy(group))` puts one group per task —
    * a handful of heavy groups (5 event types over 100 TB) means 5 tasks do
    * all the work. This shape keeps the sort fully distributed regardless
    * of group cardinality; only the offsets frame (|groups| rows) is ever
    * single-partition. Returns the projected (group, v, ties..., rank)
    * frame; `n` (group size) rides along for rank-based cuts.
    */
  def groupedRanks(df: DataFrame, groupCol: String, valueCol: Column,
      orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val projected = df.select((col(groupCol).as("g") +: valueCol.as("v") +:
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }): _*)
    val sorted = projected.orderBy(
      col("g") +: col("v") +: orderCols.indices.map(i => col(s"t$i")): _*)
    val schema = sorted.schema.add("gidx", LongType)
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    // per-group start offsets: cumulative counts over the group frame (tiny)
    val w = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = projected.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(w), lit(0L)))
    indexed.join(broadcast(offsets), "g")
      .withColumn("rank", col("gidx") - col("offset") + 1)
      .drop("gidx", "offset")
  }

  /** Largest-remainder (Hamilton) apportionment of `seats` integer seats
    * proportional to a per-key integer weight. Returns
    * (key, weight, base_seats, extra, seats).
    *
    * Exactness: quota arithmetic is integer cross-multiplication —
    * `base = (seats·w) div W`, remainder `seats·w − base·W` — so there is
    * no floating-point anywhere and any engine allocates identically. The
    * `extra` ranking breaks remainder ties by key ascending (a stated
    * policy, not an accident). Requires `seats·max(w)` to fit in a long.
    *
    * Scale shape: weights aggregate map-side; the allocation itself runs
    * over |keys| rows (tiny). The grand total is a 1-row broadcast.
    */
  def quotaAllocation(weights: DataFrame, keyCol: String, weightCol: String,
      seats: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seats >= 1, s"seats=$seats must be positive")
    val w = weights.select(col(keyCol).as("key"), col(weightCol).cast("long").as("w"))
    val tot = w.agg(sum(col("w")).as("__W"))
    val based = w.crossJoin(broadcast(tot))
      .withColumn("base_seats", expr(s"($seats * w) div __W"))
      .withColumn("rem", expr(s"$seats * w - base_seats * __W"))
    val win = Window.orderBy(col("rem").desc, col("key"))
    val leftover = based.agg((lit(seats) - sum(col("base_seats"))).as("__left"))
    based
      .withColumn("rn", row_number().over(win))
      .crossJoin(broadcast(leftover))
      .withColumn("extra", when(col("rn") <= col("__left"), 1L).otherwise(0L))
      .select(col("key"), col("w").as("weight"), col("base_seats"),
        col("extra"), (col("base_seats") + col("extra")).as("seats"))
  }
}
