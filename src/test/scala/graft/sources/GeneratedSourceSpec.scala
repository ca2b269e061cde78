package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom DSv2 source: pushdown reaches the source (the scan interval
  * narrows and plans fewer partitions), projection prunes the produced
  * columns, and the generated values replay exactly.
  */
class GeneratedSourceSpec extends SparkSpec {

  import spark.implicits._

  private def read(rows: Long = 100000L, parts: Int = 8) =
    spark.read.format("graft-gen")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): GeneratedScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GeneratedScan]
    }.get

  test("range predicates on id narrow the scan interval at the source") {
    val df = read().filter(col("id") >= 25000L && col("id") < 75000L)
    val scan = scanOf(df)
    assert(scan.description().startsWith("GeneratedScan[25000,75000)"),
      scan.description())
    assert(df.count() === 50000L)
  }

  test("a selective filter plans fewer input partitions (source-side pruning)") {
    val full = scanOf(read()).planInputPartitions().length
    val pruned = scanOf(read().filter(col("id") < 12500L)).planInputPartitions()
    assert(full === 8)
    assert(pruned.length === 1, s"expected 1 partition, got ${pruned.length}")
  }

  test("projection prunes the produced columns") {
    val scan = scanOf(read().select(col("bucket")))
    assert(scan.readSchema().fieldNames.toSeq === Seq("bucket"))
  }

  test("boundary-value pushed filters saturate instead of wrapping (id <= Long.MaxValue)") {
    // v+1 on Long.MaxValue used to wrap negative and empty the scan — and
    // because the filter reports as fully pushed, Spark would never
    // re-check it, silently losing every row (ADVICE r7)
    val le = read(rows = 1000L).filter(col("id") <= Long.MaxValue)
    assert(le.count() === 1000L)
    val gt = read(rows = 1000L).filter(col("id") > Long.MaxValue)
    assert(gt.count() === 0L)
    val eq = read(rows = 1000L).filter(col("id") === Long.MaxValue)
    assert(eq.count() === 0L)
  }

  test("overwrite mode truncates a prior tally (advertised TRUNCATE is real)") {
    val tag = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    read(rows = 3000L, parts = 4)
      .write.format("graft-count").option("run", tag).mode("append").save()
    assert(CountingSink.committed.get(tag)._1 === 3000L)
    // overwrite = truncate-then-write: the tally restarts, not accumulates
    read(rows = 2000L, parts = 4)
      .write.format("graft-count").option("run", tag).mode("overwrite").save()
    val (rows, tasks) = CountingSink.committed.get(tag)
    assert(rows === 2000L)
    assert(tasks === 4)
  }

  test("a failed overwrite leaves the prior committed tally intact (2PC)") {
    val tag = "f_" + java.util.UUID.randomUUID().toString.replace("-", "")
    read(rows = 3000L, parts = 4)
      .write.format("graft-count").option("run", tag).mode("append").save()
    assert(CountingSink.committed.get(tag)._1 === 3000L)
    // truncation must happen at COMMIT, not at write planning: a job that
    // fails mid-write aborts, and the previous tally stays visible
    intercept[Exception] {
      read(rows = 100L, parts = 2)
        .withColumn("boom", expr("raise_error('mid-write failure')"))
        .write.format("graft-count").option("run", tag).mode("overwrite").save()
    }
    assert(CountingSink.committed.get(tag)._1 === 3000L)
  }

  test("append mode accumulates into the prior tally (review r9)") {
    val tag = "acc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    read(rows = 1000L, parts = 2)
      .write.format("graft-count").option("run", tag).mode("append").save()
    read(rows = 500L, parts = 2)
      .write.format("graft-count").option("run", tag).mode("append").save()
    // an unconditional put() made the second append behave like overwrite
    val (rows, tasks) = CountingSink.committed.get(tag)
    assert(rows === 1500L)
    assert(tasks === 4)
  }

  test("checkpoint restart never regresses offsets or re-emits rows (review r9)") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_gen_restart").toFile
    val out = new java.io.File(base, "out").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-gen")
        .option("rows", "6000").option("parts", "4").option("batchRows", "1500")
        .load()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 6000L)
    // a fresh stream instance starts its in-memory cursor at lo: without
    // the deserialize/commit ratchet, this restart reported latest=1500
    // behind the committed 6000 and re-delivered rows 1500-6000
    runOnce()
    val ids = spark.read.parquet(out).select("id")
    assert(ids.count() === 6000L, "restart re-emitted rows")
    assert(ids.distinct().count() === 6000L)
    org.apache.hadoop.fs.FileUtil.fullyDelete(base)
  }

  test("unsupported predicates stay residual and still filter correctly") {
    // bucket isn't pushable: the source keeps the full interval, Spark
    // re-evaluates the predicate above the scan
    val df = read(rows = 1000L).filter(col("bucket") === 3)
    assert(scanOf(df).description().startsWith("GeneratedScan[0,1000)"))
    assert(df.count() === 63L) // ids 3, 19, 35, ... under 1000
  }

  test("micro-batch stream over the source equals the batch read (multi-batch)") {
    import org.apache.spark.sql.streaming.Trigger
    val sink = "gen_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft-gen")
      .option("rows", "10000").option("parts", "4").option("batchRows", "1500")
      .load()
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("sum_id"))
      .writeStream.outputMode("complete").format("memory").queryName(sink)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // 10000 rows at 1500/batch -> at least 7 micro-batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
    val want = read(rows = 10000L, parts = 4)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("id")).as("sum_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    spark.catalog.dropTempView(sink)
  }

  test("DSv2 write path: per-task commit messages aggregate at the driver") {
    val tag = "w_" + java.util.UUID.randomUUID().toString.replace("-", "")
    read(rows = 5000L, parts = 4)
      .write.format("graft-count").option("run", tag).mode("append").save()
    val (rows, tasks) = CountingSink.committed.get(tag)
    assert(rows === 5000L)
    assert(tasks === 4) // one commit message per input partition
  }

  test("generated values replay the documented pure function of id") {
    val got = read(rows = 100L, parts = 2)
      .select("id", "val", "bucket", "label").as[(Long, Double, Int, String)]
      .collect().sortBy(_._1)
    assert(got.length === 100)
    got.foreach { case (id, v, b, l) =>
      assert(v === GeneratedSource.valOf(id))
      assert(b === GeneratedSource.bucketOf(id))
      assert(l === GeneratedSource.labelOf(id))
    }
  }
}
