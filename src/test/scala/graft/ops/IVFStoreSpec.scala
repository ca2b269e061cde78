package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[IVFStore]]: incremental appends equal the one-shot full-corpus
  * assignment under the same frozen centroids; probes PRUNE to the nprobe
  * cell partitions (the plan must show it, not just the numbers); the
  * generation ledger is crash-safe; a store reopens across sessions.
  */
class IVFStoreSpec extends SparkSpec {

  private def tempRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfstore-").toString

  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val query: Seq[Float] =
    embs.filter(col("vec_id") === 0).head().getSeq[Float](1).toSeq

  private def ids(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("append batches == one-shot assignment: identical topK") {
    val maxId = embs.agg(max(col("vec_id"))).head().getLong(0)
    val t = (maxId + 1) * 4 / 5
    val index = IVF.train(embs.filter(col("vec_id") < t), c = 16, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    st.append(embs.filter(col("vec_id") < t))
    st.append(embs.filter(col("vec_id") >= t))
    val incremental = ids(st.topK(query, k = 20, nprobe = 4))
    val oneShot = ids(IVF.topK(embs, index, query, k = 20, nprobe = 4))
    assert(incremental === oneShot)
    assert(st.committedGens() === Seq(0, 1))
  }

  test("probe scan prunes to the nprobe cell partitions") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    st.append(embs)
    val plan = st.topK(query, k = 20, nprobe = 4)
      .queryExecution.executedPlan.toString
    // the isin(cell) filter must land as a PARTITION filter on the scan,
    // not a post-scan row filter over the whole corpus
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(3000))
    // and the store really holds multiple cells, else pruning is vacuous
    assert(st.cells().select("cell").distinct().count() > 4)
  }

  test("crash before commit is invisible; retry lands the generation") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    val base = embs.filter(col("vec_id") < 100)
    val batch = embs.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    st.append(base)
    st.append(batch, crashBeforeCommit = true)
    assert(st.committedGens() === Seq(0))
    assert(st.cells().count() === base.filter(col("embedding").isNotNull).count())
    st.append(batch)
    assert(st.committedGens() === Seq(0, 1))
    assert(st.cells().count() ===
      base.filter(col("embedding").isNotNull).count() +
        batch.filter(col("embedding").isNotNull).count())
  }

  test("delete masks vectors: topK == one-shot over the SURVIVORS; pruning survives the mask join") {
    val maxId = embs.agg(max(col("vec_id"))).head().getLong(0)
    val t = (maxId + 1) * 4 / 5
    val index = IVF.train(embs.filter(col("vec_id") < t), c = 16, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    st.append(embs.filter(col("vec_id") < t))
    st.append(embs.filter(col("vec_id") >= t))
    val delPred = pmod(col("vec_id"), lit(10)) === 7 && col("vec_id") >= 16
    st.delete(embs.filter(delPred).select("vec_id"))
    assert(st.deleteGens() === Seq(2))
    val masked = st.topK(query, k = 20, nprobe = 4)
    val oneShot = ids(IVF.topK(embs.filter(!delPred), index, query, k = 20, nprobe = 4))
    assert(ids(masked) === oneShot)
    // the cell filter must still prune partitions below the tombstone join
    val plan = masked.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(3000))
  }

  test("crash before delete commit is invisible; re-append resurrects; compact folds tombstones") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    val live = embs.filter(col("vec_id") < 200 && col("embedding").isNotNull)
    st.append(live)
    val before = ids(st.topK(query, k = 10, nprobe = 4))
    st.delete(live.filter(col("vec_id") >= 100).select("vec_id"), crashBeforeCommit = true)
    assert(st.deleteGens() === Seq.empty)
    assert(ids(st.topK(query, k = 10, nprobe = 4)) === before)
    // retry lands; the survivors' view holds
    st.delete(live.filter(col("vec_id") >= 100).select("vec_id"))
    assert(st.cells().count() === live.filter(col("vec_id") < 100).count())
    // re-appending a deleted range resurrects it (latest event wins)
    st.append(live.filter(col("vec_id") >= 100 && col("vec_id") < 150))
    assert(st.cells().count() === live.filter(col("vec_id") < 150).count())
    // compact applies tombstones for real and restores the join-free path
    st.compact()
    assert(st.committedGens().size === 1)
    assert(st.deleteGens() === Seq.empty)
    assert(st.cells().count() === live.filter(col("vec_id") < 150).count())
    assert(ids(st.topK(query, k = 10, nprobe = 4)) ===
      ids(IVF.topK(live.filter(col("vec_id") < 150), index, query, k = 10, nprobe = 4)))
  }

  test("open() reloads frozen centroids bit-identically") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val root = tempRoot()
    val st = IVFStore.create(spark, root, index)
    st.append(embs.filter(col("vec_id") < 100))
    val reopened = IVFStore.open(spark, root)
    assert(reopened.index.centroids === index.centroids)
    // appends through the reopened handle keep the equivalence
    reopened.append(embs.filter(col("vec_id") >= 100))
    val viaStore = ids(reopened.topK(query, k = 10, nprobe = 4))
    val oneShot = ids(IVF.topK(embs, index, query, k = 10, nprobe = 4))
    assert(viaStore === oneShot)
  }

  test("search config persists: reopened store probes with the builder's defaultNprobe") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val root = tempRoot()
    IVFStore.create(spark, root, index, defaultNprobe = 4).append(embs)
    val reopened = IVFStore.open(spark, root)
    assert(reopened.defaultNprobe === 4)
    // the no-argument probe really uses it (== an explicit nprobe=4 probe)
    assert(ids(reopened.topK(query, k = 10)) ===
      ids(reopened.topK(query, k = 10, nprobe = 4)))
  }

  test("open() refuses a directory without _config, and a config/centroids mismatch") {
    val err = intercept[IllegalArgumentException] {
      IVFStore.open(spark, tempRoot())
    }
    assert(err.getMessage.contains("not an IVF store"))

    // corrupt store: config says dim=3 but the centroids file holds dim=4
    val index = IVF.train(embs, c = 8, iters = 0)
    val root = tempRoot()
    IVFStore.create(spark, root, index, defaultNprobe = 2)
    // overwrite through the Hadoop FS handle — a raw java.nio write would
    // leave the local ChecksumFileSystem's stale ._config.crc sidecar
    // behind and the reopen would die on ChecksumException instead
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_config"), true)
    out.write("dim=3;cells=8;metric=cosine;defaultNprobe=2".getBytes("UTF-8"))
    out.close()
    val mismatch = intercept[IllegalArgumentException] {
      IVFStore.open(spark, root)
    }
    assert(mismatch.getMessage.contains("corrupt or mixed"))
  }

  test("deleting EVERY vector then compacting leaves a readable empty store") {
    val index = IVF.train(embs, c = 8, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    val live = embs.filter(col("vec_id") < 100 && col("embedding").isNotNull)
    st.append(live)
    st.delete(live.select("vec_id"))
    // the fold is ZERO rows — before the fix this committed a zero-file
    // dynamic-partition dir and every later read died on schema inference
    st.compact()
    assert(st.committedGens().size === 1)
    assert(st.deleteGens() === Seq.empty)
    assert(st.cells().count() === 0)
    assert(st.topK(query, k = 5).collect().isEmpty)
    // and the store remains writable: life continues after total takedown
    st.append(live.filter(col("vec_id") < 10))
    assert(st.cells().count() === live.filter(col("vec_id") < 10).count())
    assert(ids(st.topK(query, k = 5)).nonEmpty)
  }

  test("a stray tmp_ marker (torn commit publication) is invisible to the ledger") {
    val index = IVF.train(embs, c = 8, iters = 0)
    val root = tempRoot()
    val st = IVFStore.create(spark, root, index)
    st.append(embs.filter(col("vec_id") < 100))
    val before = st.committedGens()
    // simulate a crash mid-publication: the key bytes landed in the tmp
    // sibling but the rename never ran — the generation must stay
    // uncommitted (markers become visible only via the atomic rename)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_commits/tmp_gen=99"), true)
    out.write("microbatch=99".getBytes("UTF-8")); out.close()
    assert(st.committedGens() === before)
    assert(!st.appliedKeys().contains("microbatch=99"))
  }

  test("append fails loudly on a wrong-dimension vector (else silently unretrievable)") {
    import spark.implicits._
    val index = IVF.train(embs, c = 8, iters = 0)
    val st = IVFStore.create(spark, tempRoot(), index)
    val wrongDim = Seq((900000L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val err = intercept[Exception] { st.append(wrongDim) }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    assert(chain(err).exists(_.contains("batch row has dim=")), chain(err).mkString("\n"))
    // null vectors still drop silently per the IVF.assign contract; a batch
    // that drops to ZERO rows must be a no-op generation, not a committed
    // zero-file dir that poisons later reads with schema-inference failure
    st.append(embs.filter(col("vec_id") === 0))
    assert(st.committedGens() === Seq(0))
    val withNull = Seq((900001L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    st.append(withNull)
    assert(st.committedGens() === Seq(0))
    assert(st.cells().count() === 1)
  }
}
