package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup

/** Stage-level profiler for the incremental-dedup catalog entries: where
  * does the 6-8 s at sf0.1 go — sketching, store writes, store reads, or
  * the candidate join? Not part of the driver contract.
  */
object IncProf {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    // INC_BUCKETS=N profiles the bucketed band layout (r14): the append's
    // store-side read should fall from O(corpus bands) to the touched
    // buckets' partitions. INC_DELETES=1 adds the takedown-traffic stages
    // (tombstone gens + resurrect), the shape whose sequential delta
    // writes r13's bench table was topped by.
    val cfg = IncrementalDedup.Config(
      bandBuckets = sys.env.getOrElse("INC_BUCKETS", "0").toInt)
    System.err.println(s"[prof] config: bandBuckets=${cfg.bandBuckets}")

    // stage 0: the pure sketch cost (what dedup_minhash pays)
    time("sketch all docs (count)") {
      IncrementalDedup.sketch(docs, cfg, "text", "doc_id").count()
    }

    val root = java.nio.file.Files.createTempDirectory("incprof-").toString
    val st = IncrementalDedup.store(spark, root, cfg)
    time("append base (6/7 of docs)") {
      st.append(docs.filter(pmod(col("doc_id"), lit(7)) =!= 0))
    }
    time("append batch (1/7)") {
      st.append(docs.filter(pmod(col("doc_id"), lit(7)) === 0))
    }
    if (sys.env.contains("INC_DELETES")) {
      time("delete (doc_id % 9 == 1)") {
        st.delete(docs.filter(pmod(col("doc_id"), lit(9)) === 1).select("doc_id"))
      }
      time("delete (doc_id % 11 == 7)") {
        st.delete(docs.filter(pmod(col("doc_id"), lit(11)) === 7).select("doc_id"))
      }
      time("resurrect append") {
        st.append(docs.filter(
          pmod(col("doc_id"), lit(9)) === 1 && pmod(col("doc_id"), lit(2)) === 0))
      }
    }
    time("candidates(0.25) count") { st.candidates(0.25).count() }
    time("candidates(0.25) count AGAIN (read-side only)") { st.candidates(0.25).count() }

    // file census: is the store fragmented into tiny parquet parts?
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
    var files = 0; var bytes = 0L
    while (it.hasNext) { val f = it.next(); if (f.isFile) { files += 1; bytes += f.getLen } }
    System.err.println(s"[prof] store files=$files bytes=$bytes")
    spark.stop()
  }
}
