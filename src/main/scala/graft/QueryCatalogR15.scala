package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup

/** Round-15 catalog additions: the batch-scoped candidate read
  * ([[IncrementalDedup.SignatureStore.candidatesForGen]], r14 verdict item
  * 3) — "what did THIS batch collide with", the nightly-ingest question
  * that prunes the whole latest-wins pair resolution to the batch's
  * `bkt=` bucket directories instead of aggregating the corpus-wide pair
  * set. The oracle is the existing full-recompute SQL restricted to pairs
  * with a side in the batch: scoping is a READ optimization that must be
  * invisible to results.
  */
object QueryCatalogR15 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** Same temp-store lifecycle as [[QueryCatalogR14.entries]]'. */
  private def withTempStore(f: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15store-")
    def deleteRec(): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val out = f(dir.toString)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try out.count()
    catch { case e: Throwable => try out.unpersist() finally deleteRec(); throw e }
    deleteRec()
    out
  }

  val entries: Seq[CatalogEntry] = Seq(

    // Batch-scoped candidates on the bucketed layout, under a takedown so
    // the live-sig masking path is exercised too: base append (gen 0),
    // batch append (gen 1), tombstone (gen 2), then "candidates involving
    // gen 1's docs". Equals the full-recompute candidates over the
    // SURVIVORS filtered to pairs with a side in the batch — the pruned
    // read (plan-pinned by BucketedBandsSpec) must lose no involving pair.
    CatalogEntry("dedup_incremental_batch_scoped",
      (s, d) => withTempStore { root =>
        val dd = docs(s, d)
        val st = IncrementalDedup.store(s, root,
          IncrementalDedup.Config(bandBuckets = 8))
        st.append(dd.filter(pmod(col("doc_id"), lit(5)) =!= 0))
        st.append(dd.filter(pmod(col("doc_id"), lit(5)) === 0))
        st.delete(dd.filter(pmod(col("doc_id"), lit(9)) === 1).select("doc_id"))
        st.candidatesForGen(1, minEstJaccard = 0.25)
      },
      Some(QueryCatalog.minhashCandidatesSqlOver("doc_id % 9 <> 1") +
        "\n  AND (doc_a % 5 = 0 OR doc_b % 5 = 0)")),

    // Snapshot-isolated reads: pin the store after two appends, then
    // MUTATE the live store (a third append and a takedown) — the
    // snapshot's candidates must equal the full recompute over exactly
    // the two pinned batches, blind to everything committed after it
    // ([[IncrementalDedup.SignatureStore.snapshot]]; one-epoch validity
    // by the compaction reader grace). The live read sees all three
    // batches minus the takedown — same store, two consistent answers.
    CatalogEntry("dedup_incremental_snapshot",
      (s, d) => withTempStore { root =>
        val dd = docs(s, d)
        val st = IncrementalDedup.store(s, root)
        st.append(dd.filter(pmod(col("doc_id"), lit(5)).isin(1, 2)))
        st.append(dd.filter(pmod(col("doc_id"), lit(5)).isin(3, 4)))
        val snap = st.snapshot()
        st.append(dd.filter(pmod(col("doc_id"), lit(5)) === 0))
        st.delete(dd.filter(pmod(col("doc_id"), lit(9)) === 2).select("doc_id"))
        snap.candidates(minEstJaccard = 0.25)
      },
      Some(QueryCatalog.minhashCandidatesSqlOver("doc_id % 5 <> 0"))))
}
