package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The versioned IVF root ([[IVFStore.retrainAndSwap]], r13 verdict item
  * 5): offline rebuild on the live corpus, atomic pointer swap, old readers
  * finishing on the retained outgoing version, and post-swap `topK` equal
  * to a from-scratch build over exactly the live vectors.
  */
class IVFRetrainSwapSpec extends SparkSpec {

  private def tempRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-swapspec-").toString

  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val query: Seq[Float] =
    embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toSeq

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("retrainAndSwap: post-swap topK == from-scratch build on the live vectors") {
    val root = tempRoot()
    val st = IVFStore.createVersioned(spark, root, IVF.train(embs, c = 16, iters = 0),
      defaultNprobe = 4)
    st.append(embs)
    val dead = embs.filter(pmod(col("vec_id"), lit(6)) === 5)
    st.delete(dead.select("vec_id"))
    val swapped = IVFStore.retrainAndSwap(spark, root, c = 16, iters = 0)

    val survivors = embs.filter(pmod(col("vec_id"), lit(6)) =!= 5)
    val freshIdx = IVF.train(survivors, c = 16, iters = 0)
    val fresh = IVF.topK(survivors, freshIdx, query, k = 20, nprobe = 4)
    assert(rows(swapped.topK(query, k = 20, nprobe = 4)) === rows(fresh))
    // the retrained centroids are the survivors' — not the stale originals
    assert(swapped.index === freshIdx)
    // the swap also folded the tombstones away: no mask join on the new root
    assert(swapped.stats().tombstoneGens === 0 && !swapped.stats().maskJoinActive)
  }

  test("the swap is a pointer move: old readers finish on the retained version") {
    val root = tempRoot()
    IVFStore.createVersioned(spark, root, IVF.train(embs, c = 8, iters = 0))
      .append(embs)
    val oldReader = IVFStore.openCurrent(spark, root)
    assert(IVFStore.currentVersion(spark, root) === 1)
    IVFStore.retrainAndSwap(spark, root, c = 8, iters = 0)
    assert(IVFStore.currentVersion(spark, root) === 2)
    // the v1 directory is retained for in-flight readers — the old handle
    // still answers queries after the swap
    assert(oldReader.topK(query, k = 5).count() === 5)
    // a new open resolves the new version
    assert(IVFStore.openCurrent(spark, root).committedGens().nonEmpty)
    // a second swap sweeps v1 (it has had a full cycle to drain) and keeps v2
    IVFStore.retrainAndSwap(spark, root, c = 8, iters = 0)
    assert(IVFStore.currentVersion(spark, root) === 3)
    assert(!new java.io.File(root, "v=1").exists())
    assert(new java.io.File(root, "v=2").exists())
  }

  // ---- the r14 verdict's headline hole: ingest racing the rebuild ---------

  test("mid-rebuild appends and takedowns DRAIN into the new version — nothing lost") {
    val root = tempRoot()
    val base = embs.filter(col("vec_id") < 300)
    val late = embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    IVFStore.createVersioned(spark, root, IVF.train(base, c = 8, iters = 0),
      defaultNprobe = 3).append(base)
    // an ingest stream keeps writing to the OUTGOING version while the
    // rebuild runs: an append (with its exactly-once key) and a takedown
    val swapped = IVFStore.retrainAndSwapImpl(spark, root, c = 8, iters = 0,
      defaultNprobe = None, midBuild = () => {
        val oldHandle = IVFStore.open(spark, s"$root/v=1")
        oldHandle.append(late, idempotencyKey = Some("batch-late"))
        oldHandle.delete(embs.filter(col("vec_id") < 50).select("vec_id"),
          idempotencyKey = Some("takedown-early"))
      })
    // the new version holds EXACTLY the outgoing version's final live set
    val got = swapped.cells().select("vec_id").collect().map(_.getLong(0)).toSet
    val want = embs.filter(col("vec_id") >= 50 && col("vec_id") < 400)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === want, "generations committed mid-rebuild must be drained, not dropped")
    // and the drained generations' idempotency keys were CARRIED: a replay
    // of the same micro-batch against the new version still no-ops
    val gensBefore = swapped.committedGens()
    swapped.append(late, idempotencyKey = Some("batch-late"))
    assert(swapped.committedGens() === gensBefore,
      "a key committed to the outgoing version must survive the swap")
  }

  test("after the swap a STALE handle to the outgoing version refuses loudly (sealed)") {
    val root = tempRoot()
    IVFStore.createVersioned(spark, root, IVF.train(embs, c = 4, iters = 0))
      .append(embs.filter(col("vec_id") < 200))
    val stale = IVFStore.openCurrent(spark, root)
    IVFStore.retrainAndSwap(spark, root, c = 4, iters = 0)
    val e = intercept[graft.meta.GenLedger.ConcurrentWriterException] {
      stale.append(embs.filter(col("vec_id") >= 200 && col("vec_id") < 250))
    }
    assert(e.getMessage.contains("sealed") && e.getMessage.contains("openCurrent"),
      s"a stale writer must be told to re-resolve the current version: ${e.getMessage}")
    // reads on the stale handle still work — the old version is retained
    // precisely for in-flight readers
    assert(stale.topK(query, k = 5).count() === 5)
  }

  test("a compaction committed mid-rebuild forces a clean reload, not duplicates") {
    val root = tempRoot()
    val a = embs.filter(col("vec_id") < 250)
    val b = embs.filter(col("vec_id") >= 250 && col("vec_id") < 350)
    val st0 = IVFStore.createVersioned(spark, root, IVF.train(a, c = 8, iters = 0))
    st0.append(a)
    st0.delete(embs.filter(col("vec_id") < 20).select("vec_id"))
    val swapped = IVFStore.retrainAndSwapImpl(spark, root, c = 8, iters = 0,
      defaultNprobe = None, midBuild = () => {
        val oldHandle = IVFStore.open(spark, s"$root/v=1")
        oldHandle.append(b)
        // the fold supersedes every generation the drain's seen-set knows —
        // "apply newer gens" would re-append the whole fold as duplicates
        oldHandle.compact()
      })
    val got = swapped.cells().select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.distinct.size === got.size, "the reload must not double-count")
    assert(got.toSet ===
      embs.filter(col("vec_id") >= 20 && col("vec_id") < 350)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  test("a mid-flight ingest mutation makes the final pass fail LOUDLY, and retry works") {
    val root = tempRoot()
    IVFStore.createVersioned(spark, root, IVF.train(embs, c = 4, iters = 0))
      .append(embs.filter(col("vec_id") < 150))
    val oldLock = new java.io.File(root, "v=1/_lock")
    // an ingest mutation holds the OUTGOING version's lease right as the
    // swap reaches its final window — the swap must refuse, not wait-drop
    intercept[graft.meta.GenLedger.ConcurrentWriterException] {
      IVFStore.retrainAndSwapImpl(spark, root, c = 4, iters = 0,
        defaultNprobe = None, midBuild = () =>
          java.nio.file.Files.write(oldLock.toPath,
            "ingest pid=7 ledger=y".getBytes("UTF-8")))
    }
    assert(IVFStore.currentVersion(spark, root) === 1, "a refused swap must not publish")
    oldLock.delete()
    IVFStore.retrainAndSwap(spark, root, c = 4, iters = 0)
    assert(IVFStore.currentVersion(spark, root) === 2)
  }

  test("concurrent retrains are serialized by the root's writer lease") {
    val root = tempRoot()
    IVFStore.createVersioned(spark, root, IVF.train(embs, c = 4, iters = 0))
      .append(embs.filter(col("vec_id") < 200))
    val lock = new java.io.File(root, "_lock")
    java.nio.file.Files.write(lock.toPath,
      "other-host pid=1 ledger=x".getBytes("UTF-8"))
    intercept[graft.meta.GenLedger.ConcurrentWriterException] {
      IVFStore.retrainAndSwap(spark, root, c = 4, iters = 0)
    }
    assert(IVFStore.currentVersion(spark, root) === 1, "refused swap must not publish")
    lock.delete()
    IVFStore.retrainAndSwap(spark, root, c = 4, iters = 0)
    assert(IVFStore.currentVersion(spark, root) === 2)
  }
}
