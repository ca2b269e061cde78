package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump plan evidence for catalog queries: `explain("formatted")` of the
  * returned frame PLUS every executed plan captured while the query runs
  * (the eager operators return persisted frames whose own explain hides
  * the interior behind an InMemoryRelation — the executed plans are what
  * actually ran). Writes one file per query.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <query1> <query2> ...
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query>...")
    val outDir = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val entry = graft.QueryCatalog.all.find(_.name == name)
        .getOrElse(sys.error(s"no catalog entry named $name"))
      val plans = mutable.ArrayBuffer.empty[(String, String)]
      val listener = new QueryExecutionListener {
        override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
          plans.synchronized {
            plans += ((fn, qe.executedPlan.toString))
          }
        override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val (formatted, execDump) = try {
        val df = entry.run(spark, sfDir)
        val f = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.mode("overwrite").format("noop").save()
        // drain async listener events
        var last = -1; var stable = 0
        val deadline = System.currentTimeMillis + 20000
        while (stable < 3 && System.currentTimeMillis < deadline) {
          Thread.sleep(100)
          val n = plans.synchronized(plans.size)
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
        (f, plans.synchronized(plans.toSeq))
      } finally spark.listenerManager.unregister(listener)
      val sb = new StringBuilder
      sb.append(s"==== $name: explain(formatted) of the returned frame ====\n")
      sb.append(formatted).append("\n")
      execDump.zipWithIndex.foreach { case ((fn, p), i) =>
        sb.append(s"\n==== $name: executed plan $i (action: $fn) ====\n")
        sb.append(p).append("\n")
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        sb.toString.getBytes("UTF-8"))
      spark.catalog.clearCache()
      System.err.println(s"[plandump] wrote $outDir/$name.txt (${execDump.size} executed plans)")
    }
    spark.stop()
  }
}
