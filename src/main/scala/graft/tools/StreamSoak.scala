package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.EventsStream

/** Streaming long-run soak (r12 verdict item 7): CrashRestartStreamingSpec
  * proves restart correctness over ~36 files, but nothing proved state
  * stays WATERMARK-BOUNDED over hundreds of micro-batches — the failure
  * mode that kills a week-long production stream is state that grows with
  * stream length, invisible in any short test.
  *
  * Drives >= `nBatches` (default 550) single-file micro-batches through
  * the deployed windowed-aggregate shape (EventsStream.hourlyAgg — the
  * same builder behind events_hourly_stream and hourlyCountsToSink):
  * event time advances 20 minutes per file, so the 1-hour watermark
  * continuously expires hour windows behind it. Asserts:
  *
  *   1. the state-store row count PLATEAUS: after a warmup, every batch's
  *      numRowsTotal stays within a fixed bound derived from the observed
  *      steady state (open windows × event types is watermark-bounded and
  *      independent of how many batches have passed);
  *   2. post-GC heap stays flat across the run (generous 1.5× + slack
  *      bound — the JVM is shared, this catches leaks, not noise);
  *   3. rows keep flowing (the sink commits grow), so a plateau can't be
  *      satisfied by a wedged query.
  *
  * Exit 0 iff all hold; prints per-phase numbers for SCALE.md. Run via
  * scripts/run_main.sh graft.tools.StreamSoak [nBatches].
  * SPARK_GRAFT_ROCKSDB=1 soaks the RocksDB provider instead (hourlyAgg's
  * callers wrap withStateBackend; this harness does the same).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(550)
    val perFile = 20
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-soak-").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))

    // one CSV per micro-batch; event time advances 20 min per file so the
    // 1 h watermark expires ~3 windows behind the head continuously
    val t0 = java.time.LocalDateTime.of(2023, 1, 1, 0, 0, 0)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    (0 until nBatches).foreach { i =>
      val tsStr = t0.plusMinutes(20L * i).format(fmt)
      val rows = (0 until perFile).map { j =>
        val et = if (j % 2 == 0) "click" else "purchase"
        s"${i.toLong * perFile + j},$tsStr,${j % 7},$et,${(j * 13 % 101).toDouble},p"
      }
      val p = Files.write(Paths.get(f"$inbox/f$i%05d.csv"),
        rows.mkString("\n").getBytes("UTF-8"))
      // FileStreamSource orders the backlog by modification time: files
      // written in a tight loop share mtimes and process out of order,
      // which races the watermark past still-queued older files and drops
      // them as late (first soak run lost 63% of hours that way) — give
      // each file a strictly increasing mtime so event time arrives in
      // order, as a real daily-ingest directory would
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }

    // accumulate EVERY progress event (recentProgress caps at ~100)
    val stateRows = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val sinkRows = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.stateOperators.nonEmpty) stateRows.add(p.stateOperators(0).numRowsTotal)
        sinkRows.addAndGet(p.sink.numOutputRows.max(0))
      }
    })

    def heapUsedMb(): Long = {
      System.gc(); Thread.sleep(200); System.gc()
      val r = Runtime.getRuntime; (r.totalMemory - r.freeMemory) / (1024 * 1024)
    }
    val heapStart = heapUsedMb()

    val events = spark.readStream
      .schema(EventsStream.rawSchema)
      .option("maxFilesPerTrigger", "1")
      .csv(inbox)
    val q = graft.streaming.StreamingConf.withStateBackend(spark)(
      EventsStream.hourlyAgg(events).writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start())
    q.awaitTermination()
    // listener events are async — drain before reading the accumulators
    var waited = 0
    while (stateRows.size < nBatches && waited < 300) { Thread.sleep(100); waited += 1 }

    val heapEnd = heapUsedMb()
    val series = { import scala.jdk.CollectionConverters._; stateRows.asScala.toVector }
    val batches = series.size
    val warm = 50
    require(batches >= nBatches,
      s"only $batches state-bearing micro-batches ran (wanted >= $nBatches)")
    val steady = series.slice(warm, warm * 2)
    val bound = steady.max * 2 // plateau bound: 2× the early steady max
    val violations = series.zipWithIndex.drop(warm * 2).filter(_._1 > bound)
    val outRows = try spark.read.parquet(s"$root/out").count() catch { case _: Throwable => 0L }

    println(s"[soak] batches=$batches stateRows_first10=${series.take(10)}")
    println(s"[soak] steady_max(batch $warm..${warm * 2})=${steady.max} " +
      s"final=${series.last} overall_max=${series.max} bound=$bound")
    println(s"[soak] sink_rows=$outRows heap_start_mb=$heapStart heap_end_mb=$heapEnd")

    var fail = false
    if (violations.nonEmpty) {
      println(s"[soak] FAIL: state exceeded plateau bound at batches " +
        s"${violations.take(5).map(_._2)} (values ${violations.take(5).map(_._1)})")
      fail = true
    }
    // completeness, not just flow: every hour the watermark passed must
    // have emitted (a soak that silently drops late data proves nothing
    // about state bounds under the full load)
    val expectedHours = (nBatches.toLong * 20 / 60) - 2 // minus watermark tail
    if (outRows < expectedHours * 2 * 9 / 10) {
      println(s"[soak] FAIL: only $outRows sink rows for ~$expectedHours closed hours " +
        "(late-data drops?)"); fail = true
    }
    if (heapEnd > heapStart * 1.5 + 512) {
      println(s"[soak] FAIL: post-GC heap grew $heapStart -> $heapEnd MB"); fail = true
    }
    println(if (fail) "[soak] RESULT: FAIL" else "[soak] RESULT: PASS")
    spark.stop()
    if (fail) sys.exit(1)
  }
}
