package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment: the testdata parquet files carry ONE row group each, so scan
  * stages (and the partial aggregates fused into them) are single-threaded
  * regardless of core count. Times spreading strategies for a heavy
  * aggregate (agg_suite's shape) and a cheap one (tpch_q6's shape) to pick
  * a policy. Not part of the driver contract.
  */
object SpreadShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def aggSuite(src: DataFrame): DataFrame = src
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"))

    def q6(src: DataFrame): DataFrame = src
      .filter(col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("agg asis", () => aggSuite(li)),
      ("agg repart32rr", () => aggSuite(li.repartition(cpus.toInt))),
      ("agg repart_key", () => aggSuite(li.repartition(col("l_orderkey")))),
      ("q6  asis", () => q6(li)),
      ("q6  repart32rr", () => q6(li.repartition(cpus.toInt))),
      ("q6  repart_key", () => q6(li.repartition(col("l_orderkey")))))

    for ((name, f) <- variants) {
      f().write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[spread] $name%-16s min ${times.min}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
