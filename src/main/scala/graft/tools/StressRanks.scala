package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Distribution

/** Dev stress: Distribution.groupedRanks (one range-partitioned sort +
  * zipWithIndex + cumulative group offsets) vs the per-group window
  * row_number, in the FEW-HEAVY-GROUPS regime the distributed form exists
  * for: with g groups, the window collapses the whole table into g tasks
  * while groupedRanks keeps every core sorting. Results cross-checked.
  */
object StressRanks {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(5L)
    // "heavy" adds 1-per-mille whale values 10^6x the base range — the
    // distribution that collapses a pure linear value-range bucket split
    // into one hot bucket (the blended linear+log position handles it)
    val heavy = args.lift(2).contains("heavy")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // bijective scramble -> total order per group, both forms must agree
    val base = pmod(col("id") * 2654435761L, lit(n))
    val v = if (heavy) base + when(col("id") % 1000 === 0, lit(n) * 1000000L)
      .otherwise(0L) else base
    val df = spark.range(n)
      .select((col("id") % groups).cast("string").as("g"), v.as("v"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
    }

    val medianKs = array(expr("(n + 1) div 2"))
    for (round <- 1 to 2) {
      println(s"--- round $round (n=$n groups=$groups)")
      time("groupedRanks (distributed)") {
        Distribution.groupedRanks(df, "g", col("v"), Seq(col("id")))
          .filter(col("rank") === 1).count()
      }
      time("window row_number (1 task/group)") {
        df.withColumn("rank", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
          .filter(col("rank") === 1).count()
      }
      // medians via SELECTION (counts shuffle, 1/1024 of rows ranked) vs
      // ranking everything and keeping one row per group
      time("median via groupedSelect") {
        Distribution.groupedSelect(df, "g", col("v"), Seq(col("id")), medianKs)
          .count()
      }
      time("median via window row_number") {
        df.withColumn("rank", row_number().over(
              Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
          .filter(col("rank") === expr("(n + 1) div 2")).count()
      }
    }
    // value check on a verifiable slice: rank-1 rows must be the per-group
    // minima under (v, id) in both forms
    val a = Distribution.groupedRanks(df, "g", col("v"), Seq(col("id")))
      .filter(col("rank") === 1).select(col("g"), col("v"), col("t0").as("id"))
    val b = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .filter(col("rank") === 1).select(col("g"), col("v"), col("id"))
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "result mismatch")
    val selMed = Distribution.groupedSelect(df, "g", col("v"), Seq(col("id")), medianKs)
      .select(col("g"), col("rank"), col("v"))
    val winMed = df.withColumn("rank", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rank") === expr("(n + 1) div 2"))
      .select(col("g"), col("rank"), col("v"))
    require(selMed.exceptAll(winMed).isEmpty && winMed.exceptAll(selMed).isEmpty,
      "median mismatch")
    println("results identical")
    spark.stop()
  }
}
