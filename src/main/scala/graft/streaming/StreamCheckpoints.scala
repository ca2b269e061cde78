package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Reads the one fact a store-compaction needs from a Structured
  * Streaming checkpoint: how far the ingest driver has COMMITTED. The
  * ingest streams key every store generation by its micro-batch id
  * (`microbatch=N`), and the store's idempotency ledger exists exactly to
  * absorb the batches the checkpoint can still re-offer — those after its
  * last committed id (foreachBatch is at-least-once: a crash between the
  * store's marker and the checkpoint's commit file replays that batch).
  *
  * ADVICE r14 flagged the hole in bounding that ledger by a GENERATION
  * count (`keyRetention`): the horizon is measured in the store's
  * history, not the driver's replay window, so a checkpoint restored from
  * backup (or a second producer interleaving generations) can re-offer a
  * batch whose key already expired — and it silently re-applies. The fix
  * is to derive expiry from the checkpoint itself: [[replayableKeys]]
  * marks the keys the driver could still re-present, and
  * [[graft.meta.GenLedger.foldedKeys]] exempts them from expiry no matter
  * how many generations ago they committed.
  */
object StreamCheckpoints {

  /** The largest micro-batch id with a commit file in `checkpointDir` —
    * every batch at or below it is durably recorded as done and will not
    * be re-offered by THIS checkpoint; None for a fresh/absent checkpoint
    * (everything is still replayable). Driver-side listing only.
    */
  def lastCommittedBatch(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val commits = new Path(checkpointDir, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) None
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .maxOption
  }

  /** The keys a checkpoint at `lastCommitted` could still re-offer —
    * `microbatch=N` with N beyond the committed floor (minus
    * `backupWindow` batches of slack for checkpoints that may be restored
    * from a backup that far behind). FAIL-SAFE for foreign keys: a key
    * this stream did not mint (a manual append's key) is always retained
    * — never silently expire idempotence that belongs to another
    * producer.
    */
  def replayableKeys(lastCommitted: Option[Long],
      backupWindow: Long = 0L): String => Boolean = {
    require(backupWindow >= 0, s"backupWindow must be >= 0 (got $backupWindow)")
    key =>
      if (!key.startsWith("microbatch=")) true
      else lastCommitted match {
        case None => true // nothing committed: every batch is replayable
        case Some(last) =>
          key.stripPrefix("microbatch=").toLongOption
            .forall(_ > last - backupWindow)
      }
  }
}
