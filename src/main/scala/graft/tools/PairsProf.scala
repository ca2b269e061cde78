package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-faithful timing for the pair-generator family: each run clears
  * the cache first (exactly like Bench.measure), so eager operators that
  * persist their result cannot serve a later run from the CacheManager.
  * Not part of the driver contract.
  */
object PairsProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"[prof] $name%-28s ${ts.min}%6.2f s  (max ${ts.max}%.2f)")
    }

    time("dedup_minhash (Replay)")(graft.ops.Replay.minhashCandidates(docs,
      k = 64, bands = 16, shingleLen = 5, maxBucket = 100, minEstJaccard = 0.25))
    time("minhash xxhash (Dedup)")(graft.ops.Dedup.minhashCandidates(docs,
      k = 64, bands = 16, shingleLen = 5, maxBucket = 100, minEstJaccard = 0.25))
    time("verified (Replay)")(graft.ops.Replay.verifiedNearDupPairs(docs,
      threshold = 0.31, k = 64, bands = 16, shingleLen = 5, maxBucket = 100))
    time("verified xxhash (Dedup)")(graft.ops.Dedup.verifiedNearDupPairs(docs,
      threshold = 0.3))
    time("ngram_jaccard (Dedup)")(graft.ops.Dedup.ngramJaccardPairs(docs,
      n = 3, threshold = 0.01, maxBucket = 100))
    time("fingerprint_overlap (Replay)")(graft.ops.Replay.fingerprintOverlapPairs(docs))
    time("embedding_neardup (Sim)")(graft.ops.Similarity.nearDupPairs(
      embs, threshold = 0.3,
      graft.ops.Similarity.rademacherPlanes(dim = 64, tables = 8, bitsPerTable = 4)))
    spark.stop()
  }
}
