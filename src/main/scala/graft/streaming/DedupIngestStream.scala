package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.IncrementalDedup

/** Continuous document ingest into the persisted dedup signature store —
  * the production wiring of [[graft.ops.IncrementalDedup]]: a file-drop
  * stream (the reference's per-file-drop design,
  * /root/reference/src/main/transformations/main.py:196-225, done with
  * Structured Streaming instead of hand-polled listings) where every
  * micro-batch becomes one store generation.
  *
  * == Exactly-once ==
  *
  * foreachBatch is an at-least-once driver: a query killed after the
  * store committed generation N but before the checkpoint recorded
  * micro-batch N replays that batch on restart. The store absorbs the
  * replay via the `idempotencyKey` ledger — the key (the micro-batch id)
  * is written INTO the generation's commit marker in the same file
  * create, so "generation committed" and "batch recorded as applied"
  * cannot tear apart; the retried append is a no-op and the stream's
  * end state equals the uninterrupted run's (pinned by
  * DedupIngestStreamSpec's kill/restart test). Conversely a crash BEFORE
  * the store's marker leaves an uncommitted generation directory that
  * the retry overwrites — the store side of the same contract.
  *
  * == 100 TB shape ==
  *
  * `maxFilesPerTrigger` bounds each micro-batch (one generation's delta
  * size and one retry unit); the store bounds read amplification with
  * `compact()`, which preserves the applied-batch ledger. The dedup
  * decisions themselves (`candidates`/`verifiedPairs`) stay queries over
  * the store, decoupled from ingest cadence — the daily pipeline appends
  * all day and asks for pairs once.
  */
object DedupIngestStream {

  /** Drain every not-yet-committed file in `inboxDir` into the store
    * (Trigger.AvailableNow), then stop.
    */
  def runOnce(spark: SparkSession, inboxDir: String, inboxSchema: StructType,
      storeRoot: String, checkpointDir: String,
      cfg: IncrementalDedup.Config = IncrementalDedup.Config(),
      maxFilesPerTrigger: Int = 1): Unit =
    start(spark, inboxDir, inboxSchema, storeRoot, checkpointDir, cfg,
      maxFilesPerTrigger).awaitTermination()

  /** Start the ingest query (long-running deployment shape; [[runOnce]]
    * drives to completion). Each micro-batch of parquet document files is
    * appended to the signature store at `storeRoot` as one generation,
    * keyed by the micro-batch id for exactly-once under restart.
    */
  def start(spark: SparkSession, inboxDir: String, inboxSchema: StructType,
      storeRoot: String, checkpointDir: String,
      cfg: IncrementalDedup.Config = IncrementalDedup.Config(),
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = spark.readStream
      .schema(inboxSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.parquet")
      .parquet(inboxDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        IncrementalDedup.store(batch.sparkSession, storeRoot, cfg)
          .append(batch.toDF(), idempotencyKey = Some(s"microbatch=$batchId"))
      }
      .start()
  }

  /** Compact the store WITHOUT expiring any idempotency key this stream's
    * checkpoint could still re-offer — the enforced form of the
    * keyRetention precondition (ADVICE r14: a generation-count horizon is
    * measured in the store's history, not the driver's replay window).
    * Reads the checkpoint's commit log; keys at or below its last
    * committed batch (minus `backupWindow` batches of restore slack) can
    * never be re-presented by this checkpoint and expire; later ones —
    * and any key this stream did not mint — survive the fold regardless
    * of `keyRetention`. Run while the ingest query is stopped (the writer
    * lease refuses otherwise).
    */
  def compactSafely(spark: SparkSession, storeRoot: String, checkpointDir: String,
      cfg: IncrementalDedup.Config = IncrementalDedup.Config(),
      keyRetention: Int = 1, backupWindow: Long = 0L): Unit = {
    val retain = StreamCheckpoints.replayableKeys(
      StreamCheckpoints.lastCommittedBatch(spark, checkpointDir), backupWindow)
    IncrementalDedup.store(spark, storeRoot, cfg).compact(keyRetention, retain)
  }
}
