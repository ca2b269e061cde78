package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IVF, IVFStore, IncrementalDedup}

/** The checkpoint-gated idempotency-key expiry (ADVICE r14, enforced):
  * `keyRetention` bounds the ledger in STORE generations, but replays are
  * defined by the DRIVER's checkpoint — a checkpoint restored from backup
  * can re-offer a batch whose key a generation-count horizon already
  * expired, and the replay then silently re-applies. [[StreamCheckpoints]]
  * derives "still replayable" from the checkpoint's commit log and
  * [[graft.meta.GenLedger.foldedKeys]] exempts those keys from expiry;
  * `compactSafely` on both ingest streams wires the two together.
  */
class StreamCheckpointGateSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private def slice(m: Int, r: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === r)

  /** Fabricate a checkpoint whose commit log records batches `ids` — the
    * only part of a checkpoint [[StreamCheckpoints]] reads (file NAMES are
    * the batch ids; content is the driver's, irrelevant here).
    */
  private def checkpointWithCommits(ids: Seq[Long]): String = {
    val dir = Files.createTempDirectory("graft-ckptgate-").toString
    Files.createDirectories(Paths.get(dir, "commits"))
    ids.foreach(i => Files.write(Paths.get(dir, "commits", i.toString),
      "v1\n{}".getBytes("UTF-8")))
    dir
  }

  test("lastCommittedBatch reads the commit log; sidecars and fresh checkpoints handled") {
    assert(StreamCheckpoints.lastCommittedBatch(spark,
      Files.createTempDirectory("graft-ckptgate-empty-").toString).isEmpty,
      "a checkpoint with no commits dir has committed nothing")
    val ckpt = checkpointWithCommits(Seq(0L, 1L, 2L))
    // the local FS writes .crc sidecars next to real files — names with
    // non-digits must be ignored, not crash the parse
    Files.write(Paths.get(ckpt, "commits", ".2.crc"), Array[Byte](1))
    assert(StreamCheckpoints.lastCommittedBatch(spark, ckpt) === Some(2L))
  }

  test("replayableKeys: beyond-floor batch keys and ALL foreign keys are replayable") {
    val fresh = StreamCheckpoints.replayableKeys(None)
    assert(fresh("microbatch=0") && fresh("anything"),
      "an uncommitted checkpoint can re-offer everything")
    val gate = StreamCheckpoints.replayableKeys(Some(2L))
    assert(!gate("microbatch=2") && !gate("microbatch=0"),
      "batches at or below the committed floor cannot be re-offered")
    assert(gate("microbatch=3"), "the batch after the floor is the at-least-once window")
    assert(gate("bootstrap-load"),
      "a key this stream did not mint must NEVER be expired by its checkpoint")
    val backup = StreamCheckpoints.replayableKeys(Some(3L), backupWindow = 2L)
    assert(backup("microbatch=2") && !backup("microbatch=1"),
      "backupWindow shifts the floor for restorable checkpoints")
  }

  test("compactSafely expires exactly the checkpoint-committed keys (dedup store)") {
    val root = Files.createTempDirectory("graft-ckptgate-store-").toString
    val st = IncrementalDedup.store(spark, root)
    (0 to 3).foreach(i =>
      st.append(slice(6, i), idempotencyKey = Some(s"microbatch=$i")))
    st.append(slice(6, 4), idempotencyKey = Some("bootstrap-load"))
    // the driver committed through batch 2; batch 3's commit file never
    // landed — the exact at-least-once window the key ledger exists for
    val ckpt = checkpointWithCommits(Seq(0L, 1L, 2L))
    DedupIngestStream.compactSafely(spark, root, ckpt) // keyRetention=1
    assert(st.appliedKeys() === Set("microbatch=3", "bootstrap-load"),
      "replayable + foreign keys survive the fold; checkpoint-committed ones expire")
    // the restart replays batch 3 — still a no-op after the fold
    val gens = st.committedGens()
    st.append(slice(6, 3), idempotencyKey = Some("microbatch=3"))
    assert(st.committedGens() === gens, "the retained key still refuses the replay")
  }

  test("backupWindow covers a checkpoint restored from backup (the ADVICE scenario)") {
    val root = Files.createTempDirectory("graft-ckptgate-backup-").toString
    val st = IncrementalDedup.store(spark, root)
    (0 to 3).foreach(i =>
      st.append(slice(6, i), idempotencyKey = Some(s"microbatch=$i")))
    val ckpt = checkpointWithCommits(Seq(0L, 1L, 2L, 3L))
    // a plain generation-count horizon would expire microbatch=2 here;
    // the operator knows backups lag at most 2 batches and says so
    DedupIngestStream.compactSafely(spark, root, ckpt, backupWindow = 2L)
    assert(st.appliedKeys() === Set("microbatch=2", "microbatch=3"))
    // the checkpoint is restored from a backup taken at batch 1: batch 2
    // is re-offered — and refused, because its key was retained
    val gens = st.committedGens()
    st.append(slice(6, 2), idempotencyKey = Some("microbatch=2"))
    assert(st.committedGens() === gens,
      "a replay from the restored checkpoint's window must no-op, not re-apply")
  }

  test("the IVF ingest stream gets the same gate") {
    val root = Files.createTempDirectory("graft-ckptgate-ivf-").toString
    val e = graft.QueryCatalog.embs(spark, sf())
    val st = IVFStore.create(spark, root, IVF.train(e, c = 4, iters = 0))
    (0 to 2).foreach(i =>
      st.append(e.filter(col("vec_id") % 3 === i), idempotencyKey = Some(s"microbatch=$i")))
    val ckpt = checkpointWithCommits(Seq(0L, 1L))
    IvfIngestStream.compactSafely(spark, root, ckpt)
    val reopened = IVFStore.open(spark, root)
    assert(reopened.appliedKeys() === Set("microbatch=2"))
    val live = reopened.cells().count()
    reopened.append(e.filter(col("vec_id") % 3 === 2), idempotencyKey = Some("microbatch=2"))
    assert(reopened.cells().count() === live, "the retained key refuses the replay post-fold")
  }
}
