package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for arbitrary catalog queries: runs each named
  * query (SPARK_GRAFT_PROF_QUERIES, comma-separated) through the noop sink
  * at SPARK_GRAFT_CPUS cores and prints every stage's wall time, task
  * count, and shuffle read/write bytes — the Spark-UI stage table, rendered
  * to stderr for a UI-less box. Not part of the driver contract.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROF_QUERIES", "link_prediction")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collect) {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        System.err.println(f"[stage] id=${si.stageId}%4d ${ms / 1000.0}%7.3f s tasks=${si.numTasks}%4d " +
          f"sRead=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%9.2f MB sWrite=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%9.2f MB " +
          f"in=${tm.inputMetrics.bytesRead / 1e6}%9.2f MB exec=${tm.executorRunTime / 1000.0}%8.2f s cpu=${tm.executorCpuTime / 1e9}%8.2f s " +
          f"gc=${tm.jvmGCTime / 1000.0}%6.2f s deser=${tm.executorDeserializeTime / 1000.0}%6.2f s " +
          f"outRows=${tm.shuffleWriteMetrics.recordsWritten}%9d " +
          s"[${si.name.takeWhile(_ != '\n').take(60)}]")
      }
    })

    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // steady-state warm on the small SF like the bench does
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"[prof] warm $name failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      for (r <- 1 to runs) {
        collect = r == runs // only print stages of the last (steadiest) run
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let async stage events land
        System.err.println(f"[prof] $name run $r: $dt%.3f s (cpus=$cpus)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
