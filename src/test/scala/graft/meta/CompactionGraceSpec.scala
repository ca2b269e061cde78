package graft.meta

import java.nio.file.Files

import scala.util.Try

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IVF, IVFStore, IncrementalDedup}

/** The one-epoch reader grace at compaction (r15): store reads bind
  * concrete `gen=N/` paths when the DataFrame is constructed, so a fold
  * that swept superseded generations immediately would fail any read
  * planned before it mid-execution (FileNotFoundException on the executors,
  * or silent row loss under `spark.sql.files.ignoreMissingFiles`). The
  * ledger now retains the generations a fold supersedes until the NEXT
  * fold — the same retained-for-in-flight-readers shape retrainAndSwap
  * uses for outgoing IVF versions — and `vacuum()` reclaims them on demand.
  */
class CompactionGraceSpec extends SparkSpec {

  private def tempRoot(): String =
    Files.createTempDirectory("graft-gracespec-").toString

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private def slice(m: Int, r: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === r)
  private def genDir(root: String, g: Int) = new java.io.File(root, s"gen=$g")

  test("a read planned before a fold still executes after it (one-epoch grace)") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(7, 1)); st.append(slice(7, 2)); st.append(slice(7, 3))
    val expected = st.sigs().count()

    val preFold = st.sigs() // paths to gen=0,1,2 bound NOW
    st.compact()            // fold commits as gen=3

    assert(preFold.count() === expected,
      "a pre-fold reader must still see its snapshot — the fold may not sweep its files")
    assert(genDir(root, 0).exists() && genDir(root, 2).exists(),
      "superseded generations are retained for one epoch")
    assert(st.sigs().count() === expected, "new reads see the fold")
    val s = st.stats()
    assert(s.generations === 1 && s.retainedGens === 3 && s.retainedBytes > 0,
      s"stats must separate live from retained, got $s")
  }

  test("the NEXT fold sweeps the previous epoch — grace is bounded, not a leak") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(7, 1)); st.append(slice(7, 2)); st.append(slice(7, 3))
    st.compact() // gen=3 fold; gens 0-2 retained
    val preSecondFold = st.sigs() // bound to gen=3 only
    st.append(slice(7, 4)) // gen=4
    val expected = st.sigs().count()
    st.compact() // gen=5 fold: sweeps everything below the PREVIOUS fold (3)

    assert(!genDir(root, 0).exists() && !genDir(root, 2).exists(),
      "generations below the previous fold must be swept by the next one")
    assert(genDir(root, 3).exists() && genDir(root, 4).exists(),
      "the newly superseded epoch is retained in its turn")
    assert(preSecondFold.count() >= 0, "a reader from within the last epoch still works")
    assert(st.sigs().count() === expected)
    assert(st.stats().retainedGens === 2)
  }

  test("a reader TWO folds old is past the grace window — the boundary is one epoch") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(7, 1)); st.append(slice(7, 2))
    val ancient = st.sigs() // gen=0,1
    st.compact() // gen=2; 0-1 retained
    st.append(slice(7, 3))
    st.compact() // gen=4; sweeps 0-1
    assert(Try(ancient.count()).isFailure,
      "the grace window is ONE epoch by design — a two-folds-old reader fails loudly")
  }

  test("vacuum() reclaims the grace window immediately, under the writer lease") {
    val root = tempRoot()
    val st = IncrementalDedup.store(spark, root)
    st.append(slice(7, 1)); st.append(slice(7, 2))
    st.compact()
    assert(st.stats().retainedGens === 2)
    assert(st.vacuum() === 2, "vacuum reports how many generations it reclaimed")
    assert(!genDir(root, 0).exists() && !genDir(root, 1).exists())
    assert(st.stats().retainedGens === 0)
    assert(st.vacuum() === 0, "idempotent: nothing left to reclaim")
    assert(st.sigs().count() > 0, "live reads unaffected")
  }

  test("the IVF store gets the same grace and the same vacuum") {
    val root = tempRoot()
    val e = graft.QueryCatalog.embs(spark, sf())
    val st = IVFStore.create(spark, root, IVF.train(e, c = 4, iters = 0))
    st.append(e.filter(col("vec_id") % 2 === 0))
    st.append(e.filter(col("vec_id") % 2 === 1))
    val preFold = st.cells()
    val expected = st.cells().count()
    st.compact()
    assert(preFold.count() === expected, "pre-fold IVF reader survives the fold")
    assert(st.stats().retainedGens === 2)
    assert(st.vacuum() === 2)
    assert(st.stats().retainedGens === 0)
    assert(st.cells().count() === expected)
  }
}
