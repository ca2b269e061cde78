package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc micro-profiler for bench hot spots: times labeled variants of a
  * query so fixed overheads (codegen, scan init, conf churn) separate from
  * real compute. Not part of the driver contract.
  */
object QuickProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    spark.range(1000000).selectExpr("sum(id)").collect()

    time("events raw scan noop") {
      spark.read.parquet(s"$sfDir/events.parquet").write.mode("overwrite").format("noop").save()
    }
    time("events + ts_us + noop") {
      graft.QueryCatalog.eventsRaw(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("json_extract as-is") {
      graft.SparkEntry.queries("json_extract")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("json_extract rerun") {
      graft.SparkEntry.queries("json_extract")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("json no-repartition get_json_object only") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .write.mode("overwrite").format("noop").save()
    }
    time("from_json typed") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .write.mode("overwrite").format("noop").save()
    }
    time("tfidf as-is") {
      graft.SparkEntry.queries("tfidf_top_terms")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    time("tfidf rerun") {
      graft.SparkEntry.queries("tfidf_top_terms")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
