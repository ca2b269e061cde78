package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times over
  * SPARK_GRAFT_SF_DIR. Queries are materialized through the noop sink so the
  * full plan executes (a count() would let Catalyst prune projection-only
  * work). SPARK_GRAFT_BENCH_FILTER (comma-separated names) restricts the set
  * for targeted profiling.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the box's cores (capped at the 32 the contract specifies) —
    // round 1 defaulted to 4 and the driver measured a 3× slower catalog
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val names = QueryCatalog.all.map(_.name)
      .filter(n => filter.forall(_.contains(n)))

    // unmeasured warmup: JVM/JIT + codegen + scan-path initialization, so the
    // first measured query doesn't carry several seconds of cold-start
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/orders.parquet").limit(1).collect()

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      System.err.println(s"[bench] running $name ...")
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      // caches accumulated by an operator (persisted sketch tables) must not
      // subsidize or starve the next query
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name: $dt%.2f s")
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
