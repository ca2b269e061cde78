package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** Dev stress: the custom bounded-heap top-k-per-group operator vs the
  * window row_number form, at rows ≫ groups·k (the regime the operator
  * exists for — the window must sort and materialize every row; the heap
  * shuffles only map-side survivors). Results cross-checked per run.
  */
object StressTopK {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(10000L)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic skewless synthetic: value is a bijective scramble of id,
    // so every (group, value) ordering is total and both forms must agree
    val df = spark.range(n)
      .select((col("id") % groups).as("g"),
        pmod(col("id") * 2654435761L, lit(n)).as("v"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    def time(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($rows rows)")
      rows
    }

    for (round <- 1 to 2) {
      println(s"--- round $round (n=$n groups=$groups k=$k)")
      val heapRows = time("native heap") {
        TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k).count()
      }
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val windowRows = time("window rn<=k") {
        df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
      }
      require(heapRows == windowRows, s"row mismatch: $heapRows vs $windowRows")
    }
    // value check beyond counts: symmetric difference must be empty
    val a = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), k)
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val b = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "result mismatch")
    println("results identical")
    spark.stop()
  }
}
