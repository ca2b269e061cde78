package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the stream-stream left-join harness: times the
  * catalog entry end-to-end at several state-store partition counts and
  * isolates the non-streaming pieces (cutoff agg, sink re-read) so the
  * per-micro-batch overhead is visible. Not part of the driver contract.
  */
object StreamProf {
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

    // the cutoff agg alone (batch read + 1-row agg)
    time("cutoff agg only") {
      spark.read.schema(graft.streaming.EventsStream.rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .agg(
          max(when(col("event_type") === "purchase", col("ts"))).as("maxp"),
          max(when(col("event_type") === "click", col("ts"))).as("maxc"))
        .select(expr("unix_micros(CAST(least(maxp, maxc) AS TIMESTAMP)) - 9000000000").as("cutoff"))
        .head
    }

    for (parts <- Seq(8, 2); rep <- 1 to 2) {
      time(s"left_join parts=$parts rep=$rep") {
        graft.streaming.EventsStream.purchaseClickLeftJoin(spark, sfDir, parts)
          .write.mode("overwrite").format("noop").save()
      }
    }

    // instrumented inline copy: count micro-batches and their durations,
    // with the checkpoint+sink optionally on tmpfs (/dev/shm)
    import org.apache.spark.sql.streaming.Trigger
    for (parts <- Seq(2, 1); base <- Seq("/tmp", "/dev/shm"); rep <- 1 to 2) {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      def side(tpe: String, prefix: String) = spark.readStream
        .schema(graft.streaming.EventsStream.rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .filter(col("event_type") === tpe)
        .select(
          col("event_id").as(s"${prefix}_id"),
          col("user_id").as(s"${prefix}_user"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as(s"${prefix}_us"),
          expr("CAST(ts AS TIMESTAMP)").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
      val joined = side("purchase", "purchase")
        .join(side("click", "click"),
          col("purchase_user") === col("click_user") &&
            col("click_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
            col("click_ts") <= col("purchase_ts"),
          "left_outer")
        .select(col("purchase_id"), col("click_id"),
          col("purchase_user").as("user_id"))
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "graft_prof_").toFile
      time(s"instrumented streaming parts=$parts base=$base rep=$rep") {
        val q = joined.writeStream
          .outputMode("append")
          .format("parquet")
          .option("path", new java.io.File(dir, "out").getAbsolutePath)
          .option("checkpointLocation", new java.io.File(dir, "ckpt").getAbsolutePath)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        if (rep == 2 && base == "/dev/shm")
          q.recentProgress.foreach { p =>
            System.err.println(s"[prof]   batch ${p.batchId}: ${p.durationMs} rows=${p.numInputRows}")
          }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
