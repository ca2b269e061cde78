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
