package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf plumbing shared by the streaming harness entry points.
  *
  * RocksDB state backend (VERDICT r4 item 9): stream-stream joins and
  * watermarked dedup are bounded by state-store I/O at scale; the
  * production knob is swapping the default HDFS-backed in-memory provider
  * for RocksDB, which spills state to local disk and bounds per-key state
  * by watermark/TTL policy instead of executor heap (SCALE.md "Streaming
  * state"). Locally the default provider is faster for the tiny sf states,
  * so RocksDB is opt-in: `SPARK_GRAFT_ROCKSDB=1` flips every harness query
  * onto it; specs force it explicitly via [[withStateBackend]].
  */
object StreamingConf {

  /** Base dir for EPHEMERAL streaming scratch — per-invocation checkpoints
    * and sink staging for the harness queries, which mint a fresh UUID dir
    * per call and carry no restart contract (the restart-safe DSv2 stream
    * keeps its checkpoint on a caller-chosen durable path). tmpfs
    * (/dev/shm) when writable: the micro-batch machinery fsyncs the
    * offset/commit WAL and state snapshots per batch, and on this box
    * /tmp is disk-backed — that IO is a fixed per-batch tax the query
    * semantics never need for a throwaway checkpoint (round-11 verdict
    * item 5). Falls back to java.io.tmpdir — also when /dev/shm is a
    * small mount (Docker's default shm is 64 MB; state snapshots plus an
    * append-sink staging dir at sf0.1 would ENOSPC mid-query even though
    * the writability probe passes), requiring ≥1 GiB usable.
    */
  lazy val scratchBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val usable =
      java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm) &&
        shm.toFile.getUsableSpace >= (1L << 30)
    if (usable) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n`, restoring
    * the previous value afterwards. State-store count = shuffle partitions
    * AT QUERY START (ROUNDLOG lesson 8), so every harness streaming entry
    * wraps its whole impl — one shared helper instead of a per-entry
    * save/set/try/finally copy, where one forgotten `finally` would
    * silently change state-store counts for every later query.
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  /** Run `body` with no-data micro-batches disabled, restoring the conf
    * afterwards. The no-data finalization batch exists to advance the
    * watermark and run eviction with no new input — a FULL extra trigger
    * execution (incremental re-plan + state-store open/commit on every
    * partition), which for a single-shot harness query is pure fixed cost
    * whenever the output cannot depend on eviction:
    *
    *   - complete-mode aggregates: every group re-emits from state each
    *     batch; eviction never adds or removes output rows;
    *   - INNER stream-stream joins in append mode: matches emit in the
    *     data batch that produces them; eviction only drops state.
    *
    * It must stay ENABLED for left-outer stream-stream joins (null-side
    * rows emit ON eviction — skipping the batch silently withholds every
    * end-of-stream unmatched row) and any append-mode windowed aggregate
    * (windows emit when the watermark passes them). On a real cluster the
    * default stays on: continuous streams need watermark-only progress
    * between bursts; this knob is about not paying that machinery 2× for
    * a bounded replay.
    */
  def withNoDataBatches[T](spark: SparkSession, enabled: Boolean)(body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, enabled.toString)
    try body
    finally spark.conf.set(key, prev)
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** True when the harness should run streaming state on RocksDB. */
  def rocksDbRequested: Boolean = sys.env.get("SPARK_GRAFT_ROCKSDB").contains("1")

  /** Run `f` with the RocksDB state-store provider set (when `enabled`),
    * restoring the previous provider conf afterwards. The provider is read
    * at query START, so the conf must wrap the `start()` call — which every
    * harness entry point does by wrapping its whole impl.
    */
  def withStateBackend[T](spark: SparkSession,
      enabled: Boolean = rocksDbRequested)(f: => T): T = {
    if (!enabled) f
    else {
      val prev = spark.conf.getOption(ProviderKey)
      spark.conf.set(ProviderKey, RocksDb)
      try f
      finally prev match {
        case Some(p) => spark.conf.set(ProviderKey, p)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
