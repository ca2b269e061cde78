package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IVF, IVFStore, IncrementalDedup}

/** The CAS control plane WIRED end-to-end (r15): a root registered via
  * [[GenLedger.registerCasBackend]] runs every marker, lease, fence, and
  * seal through [[CasLedgerOps]] over a [[ConditionalStore]] — the
  * protocol an object store without atomic rename (plain S3) supports —
  * while the data plane (parquet generations, `_config`) stays on the
  * filesystem. CasLedgerSpec races the protocol's primitives; THIS spec
  * proves the real stores' full lifecycles produce identical results on
  * either backend and that no control-plane file ever touches the FS.
  */
class CasStoreEndToEndSpec extends SparkSpec {

  private def tempRoot(): String =
    Files.createTempDirectory("graft-casroot-").toString

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
  private def slice(m: Int, r: Int) = docs.filter(pmod(col("doc_id"), lit(m)) === r)
  private def fsFile(root: String, name: String) = new java.io.File(root, name)

  /** Register `mem` for a fresh root, run `body`, always unregister. */
  private def withCasRoot[T](mem: ConditionalStore.InMemory)(body: String => T): T = {
    val root = tempRoot()
    GenLedger.registerCasBackend(root, mem)
    try body(root) finally GenLedger.unregisterCasBackend(root)
  }

  test("dedup store lifecycle over CAS == rename twin; control plane never touches the FS") {
    val mem = new ConditionalStore.InMemory
    withCasRoot(mem) { root =>
      val renameRoot = tempRoot()
      val cas = IncrementalDedup.store(spark, root)
      val ren = IncrementalDedup.store(spark, renameRoot)
      for (st <- Seq(cas, ren)) {
        st.append(slice(7, 1), idempotencyKey = Some("b1"))
        st.append(slice(7, 2), idempotencyKey = Some("b2"))
        st.append(slice(7, 2), idempotencyKey = Some("b2")) // replay no-ops
        st.append(slice(7, 3))
        st.delete(slice(21, 2).select("doc_id"))
        st.compact()
        st.vacuum()
      }
      assert(cas.committedGens() === ren.committedGens(),
        "identical mutation history must mint identical generations on either backend")
      val casIds = cas.sigs().select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val renIds = ren.sigs().select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(casIds === renIds, "survivors must match the rename twin exactly")
      assert(cas.candidates().count() === ren.candidates().count())
      assert(cas.appliedKeys() === ren.appliedKeys())

      // the control plane lives in the object store, not on the FS...
      for (name <- Seq("_commits", "_tombstones", "_compactions", "_lock", "_sealed"))
        assert(!fsFile(root, name).exists(),
          s"$name must not exist on the filesystem under a CAS-routed root")
      assert(mem.list(s"$root/_commits/").nonEmpty, "commits live in the object store")
      // ...and the data plane stays parquet-on-FS
      assert(fsFile(root, s"gen=${cas.committedGens().head}").exists(),
        "generation data directories are the DATA plane — still on the FS")
    }
  }

  test("IVF versioned store with retrainAndSwap runs entirely over CAS") {
    val mem = new ConditionalStore.InMemory
    withCasRoot(mem) { root =>
      val e = graft.QueryCatalog.embs(spark, sf())
      val st0 = IVFStore.createVersioned(spark, root, IVF.train(e, c = 4, iters = 0))
      st0.append(e.filter(col("vec_id") % 2 === 0), idempotencyKey = Some("even"))
      st0.append(e.filter(col("vec_id") % 2 === 1))
      st0.delete(e.filter(col("vec_id") < 50).select("vec_id"))
      val liveBefore = st0.cells().count()

      val st1 = IVFStore.retrainAndSwap(spark, root, c = 4, iters = 0)
      assert(st1.cells().count() === liveBefore,
        "the swap must carry exactly the live vectors into the new version")
      // exactly-once across the swap: the bulk load carried the keys
      assert(st1.appliedKeys().contains("even"))
      st1.append(e.filter(col("vec_id") % 2 === 0), idempotencyKey = Some("even"))
      assert(st1.cells().count() === liveBefore, "a replayed batch still no-ops post-swap")

      // the outgoing version (v=1 — createVersioned starts there) was
      // SEALED through the CAS control plane: a stale handle's mutation
      // refuses loudly, and the seal marker is an object, not a file
      val stale = IVFStore.open(spark, s"$root/v=1")
      val err = intercept[GenLedger.ConcurrentWriterException] {
        stale.append(e.limit(10))
      }
      assert(err.getMessage.contains("sealed"))
      assert(mem.get(s"$root/v=1/_sealed").isDefined)
      assert(!fsFile(s"$root/v=1", "_sealed").exists())
      for (v <- Seq(1, 2); name <- Seq("_commits", "_lock"))
        assert(!fsFile(s"$root/v=$v", name).exists(),
          s"v=$v/$name must live in the object store, not the FS")

      // probes still work end-to-end on the swapped version
      val q = e.select("embedding").head.getSeq[Float](0)
      assert(st1.topK(q, 5).count() === 5)
    }
  }

  test("a poached CAS lease fences every commit kind before anything is visible") {
    val mem = new ConditionalStore.InMemory
    withCasRoot(mem) { root =>
      val ledger = new GenLedger(spark, root)
      val lockKey = s"$root/_lock"
      ledger.withWriterLock {
        // the poacher's end state: our lock object replaced, etag rotated —
        // our fencing token is dead even though the holder id could be
        // forged (token fencing is ABA-proof where the id re-read is not)
        mem.delete(lockKey)
        mem.putIfAbsent(lockKey, "poacher".getBytes("UTF-8"))
        val e = intercept[GenLedger.ConcurrentWriterException] {
          ledger.commitAppend(0, None)
        }
        assert(e.getMessage.contains("fencing token"))
        assert(ledger.committedGens().isEmpty, "a fenced commit publishes nothing")
        intercept[GenLedger.ConcurrentWriterException] { ledger.commitDelete(0, None) }
        assert(mem.get(s"$root/_tombstones/gen=0").isEmpty,
          "the fence fires before the tombstone kind marker")
        intercept[GenLedger.ConcurrentWriterException] { ledger.commitCompaction(0, Nil) }
        assert(mem.get(s"$root/_compactions/gen=0").isEmpty)
      }
      // release must not delete the poacher's lease
      assert(mem.get(lockKey).map(t => new String(t._1, "UTF-8")) === Some("poacher"))
      mem.delete(lockKey)
    }
  }

  test("a live CAS writer refuses a second writer; a stale one is reclaimed") {
    val mem = new ConditionalStore.InMemory
    withCasRoot(mem) { root =>
      val st = IncrementalDedup.store(spark, root)
      st.append(slice(7, 1))
      // a LIVE foreign lock (fresh object) refuses the mutation
      mem.putIfAbsent(s"$root/_lock", "other-writer".getBytes("UTF-8"))
      val e = intercept[GenLedger.ConcurrentWriterException] { st.append(slice(7, 2)) }
      assert(e.getMessage.contains("other-writer"))
      assert(st.committedGens() === Seq(0))
      // heartbeats stopped long ago -> stale -> reclaimed and the append runs
      mem.ageBack(s"$root/_lock", GenLedger.DefaultLockStaleMs + 60000L)
      st.append(slice(7, 2))
      assert(st.committedGens() === Seq(0, 1))
      assert(mem.get(s"$root/_lock").isEmpty, "the reclaimed lease is released after the mutation")
    }
  }

  test("compaction grace and vacuum behave identically over CAS") {
    val mem = new ConditionalStore.InMemory
    withCasRoot(mem) { root =>
      val st = IncrementalDedup.store(spark, root)
      st.append(slice(7, 1)); st.append(slice(7, 2))
      val preFold = st.sigs()
      val expected = preFold.count()
      st.compact()
      assert(preFold.count() === expected, "pre-fold reader survives the fold (grace)")
      assert(st.stats().retainedGens === 2)
      assert(st.vacuum() === 2)
      assert(st.stats().retainedGens === 0)
      assert(st.sigs().count() === expected)
    }
  }
}
