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
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).toSet)
    val names = QueryCatalog.all.map(_.name)
      .filter(n => filter.forall(_.contains(n)))

    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    // canonical-path compare so a trailing slash / symlink can't alias the
    // warmup dir onto the measured dataset (would warm the page cache too)
    def canon(p: String) = new java.io.File(p).getCanonicalPath
    val warmed = sys.env.get("SPARK_GRAFT_SKIP_WARM").isEmpty &&
      new java.io.File(warmDir).exists && canon(warmDir) != canon(sfDir)

    // Min of N runs per query (default 3, r8 verdict): the r3 driver tail
    // showed 9.9 s for a query that measures 1.2 s clean — box contention /
    // GC artifacts, not plan problems. Min-of-N is the standard steady-state
    // estimator under one-sided noise; N is a knob for targeted profiling.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)

    // 1-min system load average, sampled at start/end so a contended run is
    // self-evident in the JSON (r8 verdict: the bench number was hostage to
    // box contention with no way to tell from the artifact)
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()

    // Session recycling (r7 verdict): a single SparkSession that warms and
    // measures all 200 queries accumulates litter — broadcast blocks,
    // streaming state-store providers, listener backlog, codegen-cache
    // evictions — and the r7 run showed a uniform 1.7× slowdown on code
    // unchanged since r6 (json_extract 0.29 s → 9.84 s in-session, 0.53 s
    // isolated). Chunking bounds the blast radius: each chunk of queries
    // gets a fresh SparkSession, a per-chunk steady-state warmup on the
    // small SF (codegen compiles + JIT amortize to zero over a 100 TB run,
    // so measured numbers should be steady-state throughput; identical
    // schemas at both SFs mean mostly identical generated source → JVM-wide
    // codegen cache hits that survive session recycling), then the measured
    // runs. Session startup/teardown is never charged to a query.
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_CHUNK", "25").toInt.max(1)

    // Two full catalog passes, chunk order REVERSED on the second (r8
    // verdict item 1): a transiently contended hour pins every sample of
    // the chunks it overlaps, but with reversed order the same chunk sits
    // at the opposite end of the timeline on the second pass — contention
    // then cannot pin BOTH samples of one query high, and the per-query
    // min across passes recovers the clean number.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)

    val warmFailed = scala.collection.mutable.LinkedHashSet[String]()
    // name -> (samples in run order across passes, all runs ok)
    val acc = scala.collection.mutable.LinkedHashMap[String, (Vector[Double], Boolean)]()
    names.foreach(n => acc(n) = (Vector.empty, true))

    // Host-speed calibration anchor (r11 verdict item 6): bench totals on
    // this box drift ~10% BETWEEN days while same-day runs agree within 1%
    // (ROUNDLOG lesson 15) — r11 burned a whole adjudication on a 1.12×
    // total that was pure host drift. Each fresh session times one fixed,
    // data-independent query (range → map-side modulo → 1024-group hash
    // aggregate → tiny shuffle: the same codegen/AQE/exchange path a real
    // catalog query takes, but zero IO and a fixed input), and the artifact
    // records all samples plus the min. A cross-round comparison divides
    // per-query times by the calib ratio first; a per-query ratio that
    // survives normalization is a code regression, one that doesn't is
    // host drift. The anchor is measured AFTER the JIT warmup collect and
    // never charged to any query.
    val calibSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def calibrate(spark: SparkSession): Unit = {
      spark.range(1000000).selectExpr("sum(id)").collect() // JIT/codegen warm
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("id % 1024 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
        .write.mode("overwrite").format("noop").save()
      calibSamples += (System.nanoTime() - t0) / 1e9
    }

    // Streaming queries live in their OWN chunk (r9 verdict item 1): a
    // streaming entry leaves loaded state-store providers whose maintenance
    // churn bleeds into whatever runs next in the same session —
    // dsv2_stream_agg's r9 samples swung 1.86 vs 4.47 s purely by chunk
    // neighborhood. Isolation + explicit StateStore teardown between
    // queries bounds that to the streaming chunk itself.
    def isStreaming(name: String) = QueryCatalog.streamingNames.contains(name)
    // uncharged teardown: unload every cached state-store provider and stop
    // the maintenance thread (lazily restarted by the next streaming query)
    def stateTeardown(): Unit =
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()

    // returns THIS invocation's ok (all `runs` samples succeeded) — the
    // accumulated acc(name)._2 folds in earlier passes, so a solo re-run
    // reading it would misclassify "failed in the passes, solo fine" as a
    // solo failure (ADVICE r10)
    def measure(spark: SparkSession, name: String, tag: String): Boolean = {
      val fn = SparkEntry.queries(name)
      System.err.println(s"[bench] $tag running $name ...")
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        // timing stops at save; cache/state teardown is not charged
        val dt = (System.nanoTime() - t0) / 1e9
        // caches accumulated by an operator (persisted sketch tables) must
        // not subsidize or starve the next run/query
        spark.catalog.clearCache()
        if (isStreaming(name)) stateTeardown()
        (dt, ok)
      }
      val (prevSamples, prevOk) = acc(name)
      acc(name) = (prevSamples ++ times.map(_._1), prevOk && times.forall(_._2))
      System.err.println(f"[bench] $tag $name: ${times.map(_._1).min}%.2f s (min of $runs, max ${times.map(_._1).max}%.2f)")
      times.forall(_._2)
    }

    def warmChunk(spark: SparkSession, chunk: Seq[String], tag: String): Unit = if (warmed) {
      chunk.foreach { name =>
        // NonFatal only: an OOM during warmup must propagate, not leave a
        // corrupted JVM producing bogus timings
        try SparkEntry.queries(name)(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case scala.util.control.NonFatal(e) =>
          // surfaced in the JSON as warm_failed (r8 verdict item 6): a
          // query that fails cold but passes warm is a cold-path bug
          // that must not hide in stderr
          warmFailed += name
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        if (isStreaming(name)) stateTeardown()
      }
      System.err.println(s"[bench] $tag chunk warmup over $warmDir done (${chunk.size} queries)")
    }

    val (streamingNames, nonStreaming) = names.partition(isStreaming)
    // store-building entries get their own fresh-JVM chunk too (r13 verdict
    // item 2): their tempdir parquet churn / persisted frames / GC pressure
    // must not subsidize or tax the shared batch chunks' timings
    val (storeNames, batchNames) =
      nonStreaming.partition(QueryCatalog.storeBuildNames.contains)
    for (pass <- 1 to passes) {
      val chunks = {
        // batch chunks + the store chunk(s) + the streaming chunk(s),
        // specials LAST on pass 1 — the reversal then puts them FIRST on
        // pass 2, so each side samples both ends of the timeline like
        // every other chunk
        val cs = batchNames.grouped(chunkSize).toSeq ++
          storeNames.grouped(chunkSize).toSeq ++
          streamingNames.grouped(chunkSize).toSeq
        if (pass % 2 == 0) cs.reverse else cs
      }
      for (chunk <- chunks) {
        val spark = newSession()
        calibrate(spark)
        warmChunk(spark, chunk, s"pass $pass")
        chunk.foreach(measure(spark, _, s"pass $pass"))
        spark.stop()
      }
    }

    val results = names.map { n =>
      val (samples, ok) = acc(n)
      (n, samples.min, samples, ok)
    }

    // Solo adjudication (r9 verdict item 6): re-run the slowest queries
    // each in a FRESH session with nothing else in the JVM's recent past —
    // the contention evidence the last two rounds had to reconstruct by
    // hand, now in the artifact. A solo time ≪ the passes' min says the
    // chunk environment (not the plan) inflated the query.
    val soloCount = sys.env.getOrElse("SPARK_GRAFT_BENCH_SOLO", "5").toInt.max(0)
    val soloFailed = scala.collection.mutable.LinkedHashSet[String]()
    val solo = results.sortBy(-_._2).take(soloCount).flatMap { case (name, _, _, _) =>
      val spark = newSession()
      calibrate(spark)
      warmChunk(spark, Seq(name), "solo")
      val before = acc(name)
      // a FAILED solo run's duration is a fast crash, not a timing — a
      // reader applying "solo ≪ passes min ⇒ chunk contention" would draw
      // exactly the wrong conclusion from it (round-10 review). Surface
      // the failure in its own field and keep the number out of `solo`.
      // measure's return is THIS run's outcome alone: the accumulated flag
      // would brand a passes-failure as a solo failure (ADVICE r10).
      val soloOk = measure(spark, name, "solo")
      val soloMin = acc(name)._1.drop(before._1.size).min
      acc(name) = before // solo samples stay out of the headline min
      spark.stop()
      if (soloOk) Some(name -> soloMin) else { soloFailed += name; None }
    }
    val loadEnd = loadAvg()

    // 4-decimal times: full double repr made the stdout line ~3× longer and
    // the r5/r6 driver capture truncated it mid-line → "parsed": null. 0.1 ms
    // resolution is far below this box's run-to-run noise.
    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Per-query spread (all samples, in run order across passes): lets a
    // reader separate one-off contention (min ≪ max) from a real regression
    // (min ≈ max both high) without a re-run (VERDICT r4 item 2).
    val spread = results.map { case (k, _, ss, _) =>
      "\"" + k + "\":[" + ss.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val warmFailedJson = warmFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val soloJson = solo.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val soloFailedJson = soloFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val calibJson =
      if (calibSamples.isEmpty) "null" else fmt(calibSamples.min)
    // the MEDIAN anchor is the honest cross-day normalizer (r14 finding):
    // "calib" is a min over ~25 chunk samples while each query's time is a
    // min over 6 — the min-statistic asymmetry lets one lucky chunk
    // understate a slow day and overstate every normalized ratio. r14's
    // clean run read min=0.502 (≈ r12's 0.501) while the median said the
    // day was 1.13× slower — exactly the uniform ~1.15× "regression" the
    // raw comparison showed. bench_compare prefers the median.
    val calibMedianJson =
      if (calibSamples.isEmpty) "null"
      else fmt(calibSamples.sorted.apply(calibSamples.size / 2))
    val calibSamplesJson = calibSamples.map(fmt).mkString("[", ",", "]")
    // Structural floors (r11 verdict item 5): per-query lower bounds that
    // are machinery semantics, not tunables — regression adjudication must
    // not flag a sample that sits at its floor. The left-outer stream-
    // stream join's null sides emit ON WATERMARK EVICTION, which requires
    // the no-data finalization micro-batch: two full trigger executions
    // (incremental re-plan + per-partition state open/commit each)
    // regardless of data volume. Measured r11: disabling the no-data batch
    // silently DROPS the unmatched rows, so the floor is the price of
    // correctness. Rationale in SCALE.md "Streaming fixed-cost floor".
    //
    // Since r15 the floor is ANCHORED IN CALIB UNITS (r14 verdict item 6):
    // a host-day constant plus a 30% slack was two stacked fudge factors.
    // `floors_calib` is the floor in multiples of this run's calib_median,
    // `floors` the resolved seconds for THIS host-day; bench_compare
    // applies slack 1.1 to calib-anchored floors (legacy 1.3 only for
    // pre-r15 artifacts). k = 2.70 is the midpoint of the two clean
    // post-store-isolation measurements (r14: 2.05 s / 0.787 median =
    // 2.60; r15: 2.25 / 0.761 = 2.95) — the cost is mostly fixed trigger
    // machinery, so it tracks the host only loosely; the resolved floor is
    // clamped below at the r11 absolute 1.7 s for fast-calib days where
    // the linear model undershoots the fixed cost.
    val floorsCalib = Map("events_stream_left_join" -> 2.70)
    val floorsCalibJson = floorsCalib
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val calibMedianVal =
      if (calibSamples.isEmpty) None
      else Some(calibSamples.sorted.apply(calibSamples.size / 2))
    val floorsJson = floorsCalib
      .map { case (k, v) =>
        // no calib samples (filtered runs): fall back to the r11 constant
        "\"" + k + "\":" + fmt(calibMedianVal.map(m => math.max(m * v, 1.7)).getOrElse(1.7))
      }.mkString("{", ",", "}")
    // Drift-normalized comparison (r11 verdict item 6): when
    // SPARK_GRAFT_BENCH_REF names a prior bench_out.json, divide this
    // run's total by the calib ratio (this host-day's speed vs the
    // reference run's) so the headline comparison is code-vs-code, not
    // host-day-vs-host-day. Regex extraction, not a JSON dep: the two
    // fields are flat numbers written by this same program.
    val refFields = for {
      refPath <- sys.env.get("SPARK_GRAFT_BENCH_REF")
      text <- scala.util.Try(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(refPath)),
        "UTF-8")).toOption
      calibRef <- """"calib":([0-9.]+)""".r.findFirstMatchIn(text).map(_.group(1).toDouble)
      valueRef <- """"value":([0-9.]+)""".r.findFirstMatchIn(text).map(_.group(1).toDouble)
      if calibSamples.nonEmpty && calibRef > 0
    } yield {
      val drift = calibSamples.min / calibRef
      s""","calib_ref":${fmt(calibRef)},"host_drift":${fmt(drift)},"value_ref":${fmt(valueRef)},"value_drift_normalized":${fmt(total / drift)}"""
    }
    val refJson = refFields.getOrElse("")
    // "warm" records whether an unmeasured steady-state warmup ran, so
    // consumers can tell warm timings from cold-start ones (ADVICE r2)
    def line(withSamples: Boolean) = {
      val samples = if (withSamples) s""","samples":$spread""" else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"passes":$passes,"loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadEnd)},"calib":$calibJson,"calib_median":$calibMedianJson,"calib_samples":$calibSamplesJson,"floors":$floorsJson,"floors_calib":$floorsCalibJson$refJson,"queries":$qs$samples,"solo":$soloJson,"solo_failed":$soloFailedJson,"failed":$failed,"warm_failed":$warmFailedJson,"sf":"$sfDir","warm":$warmed,"warm_dir":"$warmDir"}"""
    }
    // stdout gets captured-and-truncated by the harness (the r3 tail lost
    // the "value" field; r5/r6 lost the whole parse) — keep stdout compact
    // (no per-sample spread) and always write the full line to a file
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line(withSamples = true) + "\n").getBytes("UTF-8"))
    println(line(withSamples = false))
  }
}
