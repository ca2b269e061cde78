package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Kill a streaming query between micro-batches and resume it from the
  * checkpoint (r11 verdict item 3): CrashInjectionSpec covers the batch
  * FileLifecycle/Staging atomicity dances, but nothing had ever stopped a
  * STREAMING query mid-run and proven the restart drains to output
  * row-identical with an uninterrupted run. Two shapes:
  *
  *   - stateless file-source ingest (IngestStream): exactly-once is the
  *     source-offset WAL + the parquet sink's _spark_metadata commit log —
  *     a batch interrupted before its sink commit re-runs wholesale and
  *     its orphaned part-files stay invisible to readers;
  *   - stateful watermarked windowed aggregate (EventsStream
  *     .hourlyCountsToSink): on top of the above, partially-filled window
  *     counts must RESURRECT from the state store (not reset to zero, not
  *     double-count the replayed batch) and the watermark must resume
  *     from its checkpointed value.
  *
  * The kill is `query.stop()` fired from the test thread while the query
  * is mid-backlog under maxFilesPerTrigger=1 — Spark's stop interrupts
  * whatever batch is in flight, which is exactly the recovery surface a
  * process kill exercises short of a JVM abort (unflushed-but-committed
  * work cannot exist: commit IS the durability point being tested).
  * Determinism note: the assertions compare final output only, which is
  * invariant to WHERE the stop lands; the `crashedEarly` asserts document
  * that the kill really happened mid-stream and are sized so a
  * pathologically fast host cannot drain the 30-file backlog inside the
  * poll latency (each micro-batch costs ≥~0.1 s of plan+commit; the stop
  * fires after the first committed rows appear).
  */
class CrashRestartStreamingSpec extends SparkSpec {

  private def pollUntil(what: String, timeoutMs: Long = 120000L)(
      cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond) {
      assert(System.currentTimeMillis() - t0 < timeoutMs,
        s"timed out waiting for $what")
      Thread.sleep(25)
    }
  }

  /** Committed sink rows (0 before the first commit — the metadata log
    * doesn't exist yet and the read throws).
    */
  private def sinkRows(path: String): Long =
    try spark.read.parquet(path).count()
    catch { case scala.util.control.NonFatal(_) => 0L }

  test("ingest killed between micro-batches resumes exactly-once from the checkpoint") {
    val root = Files.createTempDirectory("graft-crash-restart-ingest").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    val header = "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost"
    (0 until 30).foreach { i =>
      Files.write(Paths.get(inbox, f"f$i%02d.csv"), String.join("\n", header,
        s"${2 * i},121,sugar,2023-03-03,1,50.0,2,100.0",
        s"${2 * i + 1},122,maida,2023-03-04,4,20.0,1,20.0").getBytes)
    }

    // uninterrupted oracle run (its own sink + checkpoint)
    IngestStream.runOnce(spark, inbox, s"$root/out_oracle", s"$root/ckpt_oracle")
    val oracle = spark.read.parquet(s"$root/out_oracle")
      .collect().map(_.toString).sorted
    assert(oracle.length === 60)

    // crash run: 1 file per micro-batch, killed after the first commit
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val q = IngestStream.start(spark, inbox, out, ckpt,
      maxFilesPerTrigger = Some(1),
      trigger = Trigger.ProcessingTime(0))
    pollUntil("first committed ingest batch")(sinkRows(out) >= 2)
    q.stop(); q.awaitTermination()
    val afterCrash = sinkRows(out)
    assert(afterCrash > 0, "kill landed before any commit — nothing to resume over")
    assert(afterCrash < 60, s"kill landed after the full backlog ($afterCrash rows) — not mid-stream")

    // resume from the same checkpoint, drain to completion
    IngestStream.runOnce(spark, inbox, out, ckpt)
    val resumed = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(resumed.length === 60, "resume lost or duplicated rows")
    assert(resumed.toSeq === oracle.toSeq)

    // idempotence: another restart with nothing new appends nothing
    IngestStream.runOnce(spark, inbox, out, ckpt)
    assert(sinkRows(out) === 60)
  }

  test("watermarked window aggregate killed mid-backlog resurrects state on restart") {
    val root = Files.createTempDirectory("graft-crash-restart-agg").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    // 36 files, 3 per hour over hours 0..11 — every window accumulates
    // across THREE micro-batches under maxFilesPerTrigger=1, so a kill is
    // overwhelmingly likely to land with at least one window half-built
    // in the state store; final watermark = 11:40 − 1 h → windows 0..9
    // finalize, 10 and 11 stay open (withheld by both runs identically)
    (0 until 36).foreach { i =>
      val hour = i / 3
      val minute = 10 + 15 * (i % 3)
      val p = Files.write(Paths.get(inbox, f"e$i%02d.csv"),
        f"2024-01-01T$hour%02d:$minute%02d:00,click,1.5".getBytes)
      // the file source drains oldest-mtime-first: distinct mtimes pin the
      // processing order to event-time order, otherwise same-millisecond
      // ties process out of order and rows land behind the watermark
      // (dropped as late — a REAL inbox writes files as time passes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }
    def src = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .csv(inbox)

    // uninterrupted oracle run
    EventsStream.hourlyCountsToSink(src, s"$root/out_oracle", s"$root/ckpt_oracle")
      .awaitTermination()
    val oracle = spark.read.parquet(s"$root/out_oracle")
      .collect().map(_.toString).sorted
    assert(oracle.length === 10, s"expected hours 0..9 finalized, got ${oracle.mkString(", ")}")

    // crash run: kill after the first window finalizes but mid-backlog
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val q = EventsStream.hourlyCountsToSink(src, out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    pollUntil("first finalized window")(sinkRows(out) >= 1)
    q.stop(); q.awaitTermination()
    val afterCrash = sinkRows(out)
    assert(afterCrash > 0, "kill landed before any window finalized")
    assert(afterCrash < 10, s"kill landed after the full backlog ($afterCrash windows) — not mid-stream")

    // resume from the same checkpoint: the state store must hand back the
    // partially-filled windows (a reset would undercount; replaying the
    // interrupted batch against surviving state would double-count)
    EventsStream.hourlyCountsToSink(src, out, ckpt).awaitTermination()
    val resumed = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(resumed.toSeq === oracle.toSeq)
  }
}
