package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Shingles}

/** Dev profiling: stage-by-stage timings of the minhash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("warmup count")(docs.count())
    val exploded = docs.repartition(col("doc_id"))
      .withColumn("norm", Shingles.normalize(col("text")))
      .filter(length(col("norm")) >= 5)
      .select(col("doc_id"), explode(Shingles.charShingles(col("norm"), 5)).as("sh"))
    time("explode shingles")(exploded.write.mode("overwrite").format("noop").save())
    val sigs = Dedup.signatures(docs, 64, 5)
    time("signatures")(sigs.write.mode("overwrite").format("noop").save())
    val cands = Dedup.minhashCandidates(docs)
    time("candidates e2e")(cands.write.mode("overwrite").format("noop").save())
    time("candidates again (cached)")(cands.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
