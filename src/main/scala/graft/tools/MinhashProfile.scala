// lives in graft.ops (not graft.tools) to reach the package-private
// Dedup.bucketPairs for stage isolation
package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PortableSketches, TextSketches}

/** Stage-by-stage timing for the two MinHash candidate paths (portable md5
  * replay kernel vs xxhash64 scale kernel) — answers "where do
  * dedup_minhash's seconds go" with numbers instead of guesses.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      // run twice, report min (codegen/JIT amortized)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${ts.min}%6.2f s  (max ${ts.max}%.2f)")
    }

    val norm = docs.repartition(col("doc_id"))
      .withColumn("norm", Shingles.normalize(col("text")))

    time("normalize only")(norm.select(col("doc_id"), col("norm")))
    time("portable sig kernel")(norm.select(col("doc_id"),
      PortableSketches.portableMinhashSig(col("norm"), 5, 64).as("sig")))
    time("xxhash64 sig kernel")(norm.select(col("doc_id"),
      TextSketches.minhashSig(col("norm"), 5, 64).as("sig")))
    val psigs = norm.select(col("doc_id"),
      PortableSketches.portableMinhashSig(col("norm"), 5, 64).as("sig"))
      .filter(size(col("sig")) > 0)
    val stringBanded = psigs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until 16).map(b =>
        struct(lit(b).as("band_idx"),
          concat_ws(",", slice(col("sig"), b * 4 + 1, 4).cast("array<string>"))
            .as("band_key"))): _*)).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_idx"), col("band.band_key"))
    val hashBanded = Dedup.lshBands(psigs, 16, 4)
    time("portable banded (string keys)")(stringBanded)
    time("portable banded (hash keys)")(hashBanded)
    time("portable pairs (string keys)")(
      Dedup.bucketPairs(stringBanded, Seq("band_idx", "band_key"), "doc_id", Seq("sig"), 100))
    time("portable pairs (hash keys)")(
      Dedup.bucketPairs(hashBanded, Seq("band_idx", "band_hash"), "doc_id", Seq("sig"), 100))
    time("portable full candidates")(Replay.minhashCandidates(docs,
      k = 64, bands = 16, shingleLen = 5, maxBucket = 100, minEstJaccard = 0.25))
    time("xxhash64 full candidates")(Dedup.minhashCandidates(docs,
      k = 64, bands = 16, shingleLen = 5, maxBucket = 100, minEstJaccard = 0.25))
    spark.stop()
  }
}
