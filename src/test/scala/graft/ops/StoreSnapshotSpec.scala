package graft.ops

import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot-isolated reads on both persisted stores (r15): [[snapshot]]
  * pins the committed (generations, tombstones) pair, so a multi-query
  * analysis resolves every read against ONE corpus while ingest keeps
  * committing. Validity is one compaction epoch — the reader-grace
  * contract — and the boundary fails loudly, never silently.
  */
class StoreSnapshotSpec extends SparkSpec {

  private def tempRoot(): String =
    Files.createTempDirectory("graft-snapspec-").toString

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private def slice(m: Int, r: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === r)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("a dedup snapshot is blind to appends and takedowns committed after it") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(5, 1)); st.append(slice(5, 2))
    val snap = st.snapshot()
    val sigsBefore = ids(snap.sigs())
    val candBefore = snap.candidates(0.25).count()

    st.append(slice(5, 3))                             // post-snapshot append
    st.delete(slice(10, 1).select("doc_id"))           // post-snapshot takedown

    assert(ids(snap.sigs()) === sigsBefore,
      "the snapshot must keep reading exactly its pinned corpus")
    assert(snap.candidates(0.25).count() === candBefore)
    assert(snap.generations.size === 2 && snap.tombstoneGens.isEmpty)
    // while the LIVE view moved on: the new batch is in, the takedown out
    val live = ids(st.sigs())
    assert(live !== sigsBefore)
    assert(live.exists(_ % 5 == 3), "live sees the post-snapshot append")
    assert(!live.exists(_ % 10 == 1), "live sees the takedown")
  }

  test("a snapshot survives ONE fold (reader grace) and fails loudly past it") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(5, 1)); st.append(slice(5, 2))
    val snap = st.snapshot()
    val expected = snap.sigs().count()
    st.compact() // fold 1: snapshot's generations retained by the grace
    assert(snap.sigs().count() === expected,
      "one fold later the snapshot still reads its exact corpus")
    st.append(slice(5, 3))
    st.compact() // fold 2 sweeps fold 1's superseded epoch
    assert(Try(snap.sigs().count()).isFailure,
      "two folds later the snapshot is past the grace window — loud, not wrong")
  }

  test("an IVF snapshot pins probes against one corpus") {
    val root = tempRoot()
    val e = graft.QueryCatalog.embs(spark, sf())
    val st = IVFStore.create(spark, root, IVF.train(e, c = 4, iters = 0))
    st.append(e.filter(col("vec_id") % 3 === 0))
    st.append(e.filter(col("vec_id") % 3 === 1))
    val snap = st.snapshot()
    val q = e.select("embedding").head.getSeq[Float](0)
    val before = snap.topK(q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cellsBefore = snap.cells().count()

    st.append(e.filter(col("vec_id") % 3 === 2))
    st.delete(e.filter(col("vec_id") % 6 === 0).select("vec_id"))

    assert(snap.cells().count() === cellsBefore, "pinned corpus, not the live one")
    val after = snap.topK(q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "a probe batch ranks against one consistent corpus")
    assert(st.cells().count() !== cellsBefore, "while the live view moved on")
  }
}
