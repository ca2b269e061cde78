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
