package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_EXTRA_CONF: semicolon-separated key=value pairs applied
    // verbatim to the session (r11 verdict item 2 — the spill-pressure
    // sweep constrains spark.memory.fraction / forces external-sorter
    // spill thresholds so the 100 TB common case, spilling operators, runs
    // under the SAME oracle gate as the happy path; scripts/spill_sweep.sh
    // is the canonical caller). Sweep axes stay out of the engine: only
    // the harness session changes, never query code.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { confs =>
      confs.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_EXTRA_CONF entry not key=value: $kv")
        builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "WARN"))
    // Spill accounting: sum every task's memory/disk spill bytes and print
    // one summary line at exit. The spill-pressure sweep asserts BOTH that
    // the oracle stays 200/200 AND that this line is non-zero — proof the
    // constrained-memory run actually exercised the external sort/agg/join
    // spill paths rather than quietly fitting in the smaller pool.
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_FILTER (comma-separated names) restricts the dump
    // for targeted local debugging; driver runs unfiltered.
    val filter = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => filter.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release per-operator persisted sketch tables between queries
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // stop() drains the (async) listener bus before returning, so the
    // spill sums are complete once it comes back
    spark.stop()
    println(s"[verify] spilled_bytes_memory=${spillMem.get} " +
      s"spilled_bytes_disk=${spillDisk.get}")
  }
}
