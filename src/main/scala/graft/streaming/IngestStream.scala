package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.Schemas

/** Streaming CSV ingest: the modern replacement for the reference's manual
  * staging-table state machine (main.py:196-225,428-448).
  *
  * The file-stream source's checkpoint records which inbox files were
  * committed — re-running with the same checkpoint processes only new files.
  * That is exactly the A→I ledger semantics (graft.meta.Staging keeps the
  * batch-mode equivalent) with exactly-once guarantees handled by the
  * engine instead of hand-written DML.
  *
  * Contract: streaming requires a fixed schema, so this path ingests
  * contract-shaped files (mandatory columns; malformed rows land in
  * `_corrupt`); heterogeneous shapes (extra columns) go through the batch
  * `etl.Validation` path, whose conform step needs per-file headers.
  */
object IngestStream {

  /** Contract schema + corrupt-record capture column. */
  val ingestSchema: StructType = StructType(
    Schemas.salesFact.fields.filterNot(_.name == "additional_column") :+
      StructField("_corrupt", StringType))

  /** Process every not-yet-committed CSV in the inbox into the output
    * parquet, then stop (Trigger.AvailableNow). Returns rows appended is
    * not knowable cheaply — callers read the output table.
    */
  def runOnce(spark: SparkSession, inboxDir: String, outDir: String,
      checkpointDir: String): Unit =
    start(spark, inboxDir, outDir, checkpointDir).awaitTermination()

  /** Start the ingest query and hand the [[StreamingQuery]] back to the
    * caller — the long-running deployment shape ([[runOnce]] is the
    * drive-to-completion wrapper). `maxFilesPerTrigger` bounds each
    * micro-batch's file count: at 100 TB an inbox burst of thousands of
    * files must not become one giant batch (a single batch is the unit of
    * retry AND of sink commit latency), and AvailableNow respects the
    * bound while still draining the backlog. Crash safety is the file
    * sink's `_spark_metadata` transaction log + the source checkpoint: a
    * query killed mid-batch re-runs that batch on restart and readers
    * never see the uncommitted files (CrashRestartStreamingSpec kills a
    * run between micro-batches and proves restart output equals an
    * uninterrupted run's).
    */
  def start(spark: SparkSession, inboxDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val reader = spark.readStream
      .schema(ingestSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("pathGlobFilter", "*.csv")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.csv(inboxDir)
    val conformed = raw
      .filter(col("_corrupt").isNull)
      .drop("_corrupt")
      .withColumn("additional_column", lit(null).cast(StringType))
    conformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }
}
