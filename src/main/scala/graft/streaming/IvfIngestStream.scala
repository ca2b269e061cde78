package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.IVFStore

/** Continuous embedding ingest into the persisted IVF index — the ANN
  * twin of [[DedupIngestStream]], completing the daily-ingest story for
  * BOTH persisted stores: documents stream into the signature store,
  * their embeddings stream into the ANN index, and both ledgers share the
  * exactly-once mechanism.
  *
  * The store must already exist (created via [[IVFStore.create]] with
  * frozen, offline-trained centroids — the standard IVF deployment:
  * training is a batch job, ingest is a stream). Each micro-batch of
  * embedding files is assigned map-side and committed as one generation
  * delta, keyed by the micro-batch id written INTO the commit marker, so
  * the foreachBatch at-least-once replay window (store committed,
  * checkpoint didn't) is an exact no-op on restart — same contract as
  * the dedup side, pinned by IvfIngestStreamSpec's kill/restart test.
  * An empty micro-batch appends no generation (and records no key):
  * there is nothing a replay could duplicate.
  *
  * 100 TB shape: `maxFilesPerTrigger` sizes each generation delta (= one
  * retry unit); probes stay decoupled from ingest cadence and read only
  * their nprobe cell partitions across generations; `compact()` bounds
  * read amplification and preserves the applied-batch ledger. The store's
  * writer lease serializes mutations: run `compact()` only while this
  * ingest query is stopped — a compact racing a live micro-batch append
  * now FAILS LOUDLY with the holder's identity
  * ([[graft.meta.GenLedger.withWriterLock]]) instead of both writers
  * minting the same generation (ADVICE r13).
  */
object IvfIngestStream {

  /** Drain every not-yet-committed file in `inboxDir` into the store
    * (Trigger.AvailableNow), then stop.
    */
  def runOnce(spark: SparkSession, inboxDir: String, inboxSchema: StructType,
      storeRoot: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Unit =
    start(spark, inboxDir, inboxSchema, storeRoot, checkpointDir,
      maxFilesPerTrigger).awaitTermination()

  /** Start the ingest query (long-running deployment shape; [[runOnce]]
    * drives to completion).
    */
  def start(spark: SparkSession, inboxDir: String, inboxSchema: StructType,
      storeRoot: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // open ONCE, outside the batch loop: the centroids are frozen at
    // create() by design, and open() collects them with a Spark job —
    // per-batch reopening would pay O(backlog-files) redundant jobs.
    // foreachBatch runs on the driver, so capturing the handle is safe.
    val store = IVFStore.open(spark, storeRoot)
    val embs = spark.readStream
      .schema(inboxSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.parquet")
      .parquet(inboxDir)
    embs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        store.append(batch.toDF(), idempotencyKey = Some(s"microbatch=$batchId"))
      }
      .start()
  }

  /** Compact the IVF store without expiring any key this stream's
    * checkpoint could still re-offer — see
    * [[DedupIngestStream.compactSafely]] (same gate, same rationale).
    * Run while the ingest query is stopped.
    */
  def compactSafely(spark: SparkSession, storeRoot: String, checkpointDir: String,
      keyRetention: Int = 1, backupWindow: Long = 0L): Unit = {
    val retain = StreamCheckpoints.replayableKeys(
      StreamCheckpoints.lastCommittedBatch(spark, checkpointDir), backupWindow)
    IVFStore.open(spark, storeRoot).compact(keyRetention, retain)
  }
}
