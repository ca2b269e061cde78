package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IVF, IVFStore}

/** Pins [[IvfIngestStream]]: a file-drop stream of embeddings appended
  * micro-batch by micro-batch into the persisted IVF index equals the
  * one-shot full-corpus assignment under the same frozen centroids, and
  * the idempotency-key ledger makes the foreachBatch at-least-once replay
  * window an exact no-op — the ANN twin of DedupIngestStreamSpec.
  */
class IvfIngestStreamSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val query: Seq[Float] =
    embs.filter(col("vec_id") === 0).head().getSeq[Float](1).toSeq

  private def ids(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** One inbox file per slice, strictly increasing mtimes (ROUNDLOG r13
    * lesson 2 — FileStreamSource tie-breaks same-mtime files arbitrarily).
    */
  private def dropFile(df: DataFrame, inbox: String, idx: Int): Unit = {
    val tmp = Files.createTempDirectory("graft-ivf-slice-").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dst = Paths.get(inbox, f"f$idx%04d.parquet")
    Files.move(part.toPath, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + idx * 1000L))
  }

  test("stream of embedding drops == one-shot assignment; checkpoint-crash replay is a no-op; ingest continues") {
    val root = Files.createTempDirectory("graft-ivfingest-").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    // offline-trained frozen centroids (the deployment shape: training is
    // a batch job, ingest is the stream)
    val index = IVF.train(embs, c = 16, iters = 0)
    IVFStore.create(spark, s"$root/store", index, defaultNprobe = 4)
    (0 to 2).foreach(i =>
      dropFile(embs.filter(pmod(col("vec_id"), lit(3)) === i), inbox, i))

    IvfIngestStream.runOnce(spark, inbox, embs.schema, s"$root/store", s"$root/ckpt")
    val st = IVFStore.open(spark, s"$root/store")
    assert(st.committedGens().size === 3) // maxFilesPerTrigger=1 → one gen per file
    val oneShot = ids(IVF.topK(embs, index, query, k = 20, nprobe = 4))
    assert(ids(st.topK(query, k = 20)) === oneShot)

    // the at-least-once window: store committed its generation, checkpoint
    // never recorded the micro-batch — delete the newest commit file
    // THROUGH the Hadoop FS (raw java.nio leaves the .crc sidecar behind
    // and the replay dies on a phantom rename conflict; r13 lesson 6)
    val commits = new java.io.File(s"$root/ckpt/commits").listFiles()
      .filterNot(_.getName.startsWith(".")).map(_.getName.toInt)
    val hfs = new org.apache.hadoop.fs.Path(s"$root/ckpt")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$root/ckpt/commits/${commits.max}"), false)
    IvfIngestStream.runOnce(spark, inbox, embs.schema, s"$root/store", s"$root/ckpt")
    assert(st.committedGens().size === 3)
    assert(ids(st.topK(query, k = 20)) === oneShot)

    // ingest continues: a later drop (fresh ids, same dim) lands as one
    // more generation and the store equals the one-shot over the union
    import spark.implicits._
    val dim = index.dim
    val extra = Seq(
      (900000L, Seq.tabulate(dim)(d => if (d == 0) 1.0f else 0.1f)),
      (900001L, Seq.tabulate(dim)(d => if (d == 1) 1.0f else 0.1f)))
      .toDF("vec_id", "embedding")
    dropFile(extra, inbox, 3)
    IvfIngestStream.runOnce(spark, inbox, embs.schema, s"$root/store", s"$root/ckpt")
    assert(st.committedGens().size === 4)
    val unionShot = ids(IVF.topK(
      embs.select("vec_id", "embedding").unionByName(extra), index, query, k = 20, nprobe = 4))
    assert(ids(st.topK(query, k = 20)) === unionShot)
  }

  test("idempotency keys survive compaction; stream-driven takedowns replay as no-ops") {
    val index = IVF.train(embs, c = 16, iters = 0)
    val root = Files.createTempDirectory("graft-ivfkeys-").toString
    val st = IVFStore.create(spark, root, index)
    val a = embs.filter(col("vec_id") < 100)
    val b = embs.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    st.append(a, idempotencyKey = Some("microbatch=0"))
    st.append(b, idempotencyKey = Some("microbatch=1"))
    assert(st.appliedKeys() === Set("microbatch=0", "microbatch=1"))
    st.compact()
    assert(st.committedGens().size === 1)
    assert(st.appliedKeys() === Set("microbatch=0", "microbatch=1"))
    st.append(a, idempotencyKey = Some("microbatch=0")) // replay across compaction
    assert(st.committedGens().size === 1)
    st.delete(a.select("vec_id"), idempotencyKey = Some("takedown=0"))
    val gensAfterDelete = st.committedGens()
    st.delete(a.select("vec_id"), idempotencyKey = Some("takedown=0"))
    assert(st.committedGens() === gensAfterDelete)
    assert(st.appliedKeys().contains("takedown=0"))
  }
}
