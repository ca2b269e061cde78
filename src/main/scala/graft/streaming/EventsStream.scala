package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference is batch-only (SURVEY.md §2.11); this is the extension the
  * events table exists for. Streaming and batch share the same transform, so
  * the streaming result is oracle-verifiable against the batch GROUP BY.
  */
object EventsStream {

  /** Raw parquet schema of events.parquet — ts is TIMESTAMP(NANOS), read as
    * long via the nanosAsLong legacy conf (same as the batch path).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window aggregate as a streaming query over the events
    * parquet, driven to completion with Trigger.AvailableNow against a
    * memory sink, returning the final result — identical to the batch
    * events_hourly query (same oracle SQL).
    *
    * On a real cluster this would be `readStream` on an arriving directory
    * with `writeStream.outputMode("append")` + watermark for state eviction;
    * complete-mode-to-memory is the local harness. State scales with
    * |open windows × event types|, bounded by the watermark.
    */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source requires a directory: stream the sf dir with a
    // glob pinned to the events table (explicit schema, no inference pass)
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      // watermarks require TIMESTAMP (with-tz); session tz is UTC so the
      // wall clock matches the batch NTZ path — cast back to NTZ on output
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("total_value"))
    val sinkName = "events_hourly_stream_" + UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    detachResult(spark, sinkName)
      .withColumn("hour_start", expr("CAST(hour_start AS TIMESTAMP_NTZ)"))
  }

  /** foreachBatch: deliver streaming micro-batches to any batch sink —
    * the production pattern for sinks without native streaming support
    * (JDBC here). Each micro-batch is appended transactionally per batch;
    * the checkpoint makes redelivery at-least-once (pair with a batch-id
    * column + dedup-on-read for exactly-once against an idempotent store).
    */
  def streamEventsToJdbc(spark: SparkSession, sfDir: String,
      url: String, table: String, props: java.util.Properties,
      checkpointDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.io.Sinks.jdbcAppend(batch.withColumn("batch_id", lit(batchId)), url, table, props)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exactly-once deduplication: watermarked dropDuplicates on
    * event_id. The input is the events stream unioned with itself (every
    * event delivered twice — the at-least-once redelivery case), and the
    * deduped stream aggregates to per-type counts, which must equal the
    * plain batch counts over the single-delivery table (the oracle).
    * State holds one key per event_id inside the watermark window and is
    * evicted beyond it — bounded memory at any stream length.
    */
  def dedupedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def src = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    // dropDuplicatesWithinWatermark (not plain dropDuplicates): eviction by
    // watermark needs either the event-time column in the key set or this
    // operator — a bare dropDuplicates("event_id") would hold state forever
    val agg = src.union(src)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
    val sinkName = "events_dedup_stream_" + UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    detachResult(spark, sinkName)
  }

  /** Copy the memory sink's (small, aggregated) result out and drop the
    * temp view — otherwise every invocation leaks a UUID-named in-memory
    * table into the session catalog for its lifetime.
    */
  private def detachResult(spark: SparkSession, sinkName: String): DataFrame = {
    val sunk = spark.table(sinkName)
    val copied = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(sunk.collect(): _*)), sunk.schema)
    spark.catalog.dropTempView(sinkName)
    copied
  }

  /** Stream-static join: streaming events enriched against the static
    * customer dimension (broadcast per micro-batch — the standard pattern
    * for dimension lookup in a stream), aggregated per market segment.
    * Oracle: the equivalent batch join SQL.
    */
  def segmentTotals(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val agg = stream
      .join(customer, stream("user_id") === customer("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
    val sinkName = "events_segment_join_" + UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sinkName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    detachResult(spark, sinkName)
  }
}
