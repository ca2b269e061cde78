package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IVF, IVFStore, IncrementalDedup}

/** Round-14 catalog additions: the store-family hardening surfaces that
  * change READ/WRITE behavior and therefore deserve their own oracle gate
  * rows — the bucketed band layout (partition-pruned appends) and the IVF
  * retrain-and-swap (offline rebuild + atomic version pointer). Both
  * oracles are the existing full-recompute SQL: layout and versioning are
  * performance/deployment machinery that must be INVISIBLE to results.
  */
object QueryCatalogR14 {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** Same temp-store lifecycle as [[QueryCatalogR13.withTempStore]] (the
    * result frame is materialized before the store files are removed).
    */
  private def withTempStore(f: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r14store-")
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

    // dedup_incremental's shape on the BUCKETED band layout (bandBuckets=8
    // — bands live under bkt= hash-partition dirs, and each append's
    // touched-bucket read partition-prunes to the batch's buckets instead
    // of scanning every stored band; plan pinned by BucketedBandsSpec).
    // The takedown-traffic mutation mix (append, two interleaved tombstone
    // gens, resurrect append) exercises every pruned read path. Oracle:
    // the full-recompute SQL over the survivors — layout must be invisible
    // to results, including cap transitions crossing bucket boundaries.
    CatalogEntry("dedup_incremental_bucketed",
      (s, d) => withTempStore { root =>
        val dd = docs(s, d)
        val st = IncrementalDedup.store(s, root,
          IncrementalDedup.Config(bandBuckets = 8))
        st.append(dd.filter(pmod(col("doc_id"), lit(5)) =!= 0))
        st.append(dd.filter(pmod(col("doc_id"), lit(5)) === 0))
        st.delete(dd.filter(pmod(col("doc_id"), lit(9)) === 1).select("doc_id"))
        st.delete(dd.filter(pmod(col("doc_id"), lit(11)) === 7).select("doc_id"))
        st.append(dd.filter(
          pmod(col("doc_id"), lit(9)) === 1 && pmod(col("doc_id"), lit(2)) === 0))
        st.candidates(minEstJaccard = 0.25)
      },
      Some(QueryCatalog.minhashCandidatesSqlOver(
        "NOT ((doc_id % 9 = 1 OR doc_id % 11 = 7)" +
          " AND NOT (doc_id % 9 = 1 AND doc_id % 2 = 0))"))),

    // Offline retrain + atomic swap (IVFStore.retrainAndSwap): a versioned
    // store is loaded, takes a takedown, then rebuilds its centroids on
    // the SURVIVORS and swaps the version pointer. IVF.train is
    // deterministic (first-16-by-id init; iters=0 keeps it closed-form),
    // so the retrained centroids are exactly the oracle's c CTE over the
    // filtered embeddings — the swap must equal a from-scratch build on
    // the survivors, which is knn_ivf's SQL over them. The delete slice
    // (vec_id % 6 = 5) never hits vec_id 0, keeping the oracle's query
    // vector defined.
    CatalogEntry("knn_ivf_retrain_swap",
      (s, d) => withTempStore { root =>
        val e = QueryCatalog.embs(s, d)
        val st = IVFStore.createVersioned(s, root,
          IVF.train(e, c = 16, iters = 0), defaultNprobe = 4)
        st.append(e)
        st.delete(e.filter(pmod(col("vec_id"), lit(6)) === 5).select("vec_id"))
        IVFStore.retrainAndSwap(s, root, c = 16, iters = 0)
          .topK(QueryCatalog.queryVec(s, d), k = 20, nprobe = 4)
          .withColumn("score", round(col("score"), 9))
      },
      Some(QueryCatalog.knnIvfSqlOver("vec_id % 6 <> 5"))))
}
