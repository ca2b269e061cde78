package graft.ops

import graft.{SparkSpec, Tables}

/** The explicit-handle caching contract (VERDICT r4 item 3): operators that
  * persist internal intermediates release them before returning, and the
  * RETURNED frame is the single persisted handle — so after a caller
  * consumes the result and unpersists it, no cached RDDs remain at all.
  */
class CacheContractSpec extends SparkSpec {

  import spark.implicits._

  private def cachedRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumped over the lazy dog"),
    (4L, "completely unrelated text about spark engines and parquet files")
  ).toDF("doc_id", "text")

  test("verifiedNearDupPairs leaks exactly one handle; unpersist clears all") {
    spark.catalog.clearCache()
    val result = Dedup.verifiedNearDupPairs(docs, threshold = 0.5)
    result.collect()
    assert(cachedRddCount === 1) // the result handle only — sketches released
    result.unpersist(blocking = true)
    assert(cachedRddCount === 0)
  }

  test("ngramJaccardPairs leaks exactly one handle; unpersist clears all") {
    spark.catalog.clearCache()
    val result = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
    result.collect()
    assert(cachedRddCount === 1)
    result.unpersist(blocking = true)
    assert(cachedRddCount === 0)
  }

  test("Similarity.nearDupPairs leaks exactly one handle; unpersist clears all") {
    spark.catalog.clearCache()
    val embs = Tables(spark, sf(), "embeddings")
    val planes = Similarity.hyperplanes(dim = 64, tables = 4, bitsPerTable = 4)
    val result = Similarity.nearDupPairs(embs, threshold = 0.3, planes)
    result.collect()
    assert(cachedRddCount === 1)
    result.unpersist(blocking = true)
    assert(cachedRddCount === 0)
  }

  test("connectedComponents driver path leaves no cached RDDs at all") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    Dedup.connectedComponents(pairs).collect()
    assert(cachedRddCount === 0) // edges cache released inside the operator
  }
}
