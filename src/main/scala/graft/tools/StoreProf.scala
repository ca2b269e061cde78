package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup

/** Job-level profiler for the persisted-store hot paths: registers a
  * SparkListener and prints every job's wall time during each labeled
  * phase, so "append = 2.5 s" decomposes into its constituent jobs
  * (sketch+count, the four delta writes, broadcast builds, read-side
  * unions). Not part of the driver contract.
  */
object StoreProf {
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

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var phase = "init"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, (System.nanoTime(), phase))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(je.jobId)
        if (s != null)
          System.err.println(f"[prof-job]   ${s._2}%-28s job=${je.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.3f s")
      }
    })

    def time[T](label: String)(f: => T): T = {
      phase = label
      val t0 = System.nanoTime()
      val r = f
      // listener events are async; give the end events a beat to land
      Thread.sleep(150)
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    val cfg = IncrementalDedup.Config(
      bandBuckets = sys.env.getOrElse("INC_BUCKETS", "0").toInt)
    System.err.println(s"[prof] config: bandBuckets=${cfg.bandBuckets}")

    // warm the kernels + codegen once so phase times are steady-state
    val warmRoot = java.nio.file.Files.createTempDirectory("storeprof-warm-").toString
    val warmSt = IncrementalDedup.store(spark, warmRoot, cfg)
    warmSt.append(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    warmSt.append(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    warmSt.delete(docs.filter(pmod(col("doc_id"), lit(9)) === 1).select("doc_id"))
    warmSt.candidates(0.25).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    val root = java.nio.file.Files.createTempDirectory("storeprof-").toString
    val st = IncrementalDedup.store(spark, root, cfg)
    time("append base (4/5)") {
      st.append(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    }
    time("append batch (1/5)") {
      st.append(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    }
    time("delete (%9==1)") {
      st.delete(docs.filter(pmod(col("doc_id"), lit(9)) === 1).select("doc_id"))
    }
    time("delete (%11==7)") {
      st.delete(docs.filter(pmod(col("doc_id"), lit(11)) === 7).select("doc_id"))
    }
    time("resurrect append") {
      st.append(docs.filter(
        pmod(col("doc_id"), lit(9)) === 1 && pmod(col("doc_id"), lit(2)) === 0))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("read: pairs()") { noop(st.pairs()) }
    spark.catalog.clearCache()
    time("read: sigs()") { noop(st.sigs()) }
    spark.catalog.clearCache()
    time("read: candidates(0.25)") { noop(st.candidates(0.25)) }
    spark.catalog.clearCache()
    time("read: candidates AGAIN") { noop(st.candidates(0.25)) }
    spark.stop()
  }
}
