package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{QueryCatalog, SparkSpec}

class StreamingSpec extends SparkSpec {

  test("streaming hourly counts equal the batch events_hourly result") {
    val streamed = EventsStream.hourlyCounts(spark, sf())
    val batch = QueryCatalog.all.find(_.name == "events_hourly").get.run(spark, sf())
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful session stream over MemoryStream: gaps close sessions across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionStream.Event]
    val gap = 1000L // 1ms gap in micros
    val q = SessionStream.sessionize(mem.toDS(), gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()

    // batch 1: user 1 has two events 500µs apart (same session)
    mem.addData(
      SessionStream.Event(1L, 1L, 1000L, 1.0),
      SessionStream.Event(1L, 2L, 1500L, 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").isEmpty) // session still open

    // batch 2: a far-future event closes the first session
    mem.addData(SessionStream.Event(1L, 3L, 10000L, 5.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[SessionStream.SessionOut].collect()
    assert(closed.length === 1)
    assert(closed.head.session_start_us === 1000L)
    assert(closed.head.session_end_us === 1500L)
    assert(closed.head.n_events === 2L)
    assert(closed.head.total_value === 3.0)
    q.stop()
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionStream.Event]
    val q = SessionStream.runningTotals(mem.toDS())
      .writeStream.outputMode("update").format("memory").queryName("totals_out").start()

    mem.addData(SessionStream.Event(1L, 1L, 100L, 2.0), SessionStream.Event(1L, 2L, 200L, 3.0))
    q.processAllAvailable()
    mem.addData(SessionStream.Event(1L, 3L, 300L, 5.0))
    q.processAllAvailable()
    // update mode: latest row per user carries the cumulative totals
    val last = spark.table("totals_out").as[SessionStream.UserTotals]
      .collect().maxBy(_.n_events)
    assert(last.n_events === 3L)
    assert(last.total_value === 10.0)
    q.stop()
  }

  test("append-mode window agg drops events later than the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Long] // event time in seconds
    val windows = mem.toDS().toDF("secs")
      .withColumn("ts", expr("timestamp_seconds(secs)"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("w"), col("cnt"))
    val q = windows.writeStream
      .outputMode("append").format("memory").queryName("late_out").start()
    try {
      mem.addData(300L, 3600L)      // 00:05 + 01:00 → watermark to 00:50, closes [00:00,00:10)
      q.processAllAvailable()
      mem.addData(360L, 7200L)      // 00:06 arrives AFTER its window closed → dropped
      q.processAllAvailable()
      val w0 = spark.table("late_out").filter(col("w") === 0L).collect()
      assert(w0.length === 1)
      assert(w0.head.getAs[Long]("cnt") === 1L) // the late 00:06 event is NOT counted
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS late_out")
    }
  }

  test("transformWithState running totals match the mapGroupsWithState API") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[SessionStream.Event]
      val q = SessionStream.runningTotalsTws(mem.toDS())
        .writeStream.outputMode("update").format("memory").queryName("tws_out").start()
      mem.addData(SessionStream.Event(1L, 1L, 100L, 2.0), SessionStream.Event(1L, 2L, 200L, 3.0))
      q.processAllAvailable()
      mem.addData(SessionStream.Event(1L, 3L, 300L, 5.0), SessionStream.Event(2L, 4L, 400L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("tws_out").as[SessionStream.UserTotals].collect()
      val u1 = rows.filter(_.user_id == 1L).maxBy(_.n_events)
      assert(u1.n_events === 3L && u1.total_value === 10.0)
      val u2 = rows.filter(_.user_id == 2L).maxBy(_.n_events)
      assert(u2.n_events === 1L && u2.total_value === 7.0)
      q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      spark.sql("DROP VIEW IF EXISTS tws_out")
    }
  }

  test("foreachBatch streams events into a JDBC table (embedded Derby)") {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val url = "jdbc:derby:memory:graftstream;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-febatch").toString
    EventsStream.streamEventsToJdbc(spark, sf(), url, "events_sink", props, ckpt)
    val back = graft.io.Sources.jdbc(spark, url, "events_sink", props)
    assert(back.count() === 1000) // sf0.001 events row count
    assert(back.columns.contains("batch_id"))
    // rerun with same checkpoint: no new batches, no duplicates
    EventsStream.streamEventsToJdbc(spark, sf(), url, "events_sink", props, ckpt)
    assert(back.count() === 1000)
  }

  test("streaming dedup of doubled delivery equals single-delivery batch counts") {
    val got = EventsStream.dedupedCounts(spark, sf()).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("total_value"))).toMap
    val want = spark.read.parquet(s"${sf()}/events.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("total_value"))).toMap
    assert(got === want)
  }

  test("streaming dedup under the RocksDB state backend matches the default provider") {
    // the SPARK_GRAFT_ROCKSDB=1 harness path, forced on explicitly: the
    // state backend must be a pure performance knob — identical results
    def run(rocks: Boolean) =
      StreamingConf.withStateBackend(spark, enabled = rocks) {
        EventsStream.dedupedCounts(spark, sf()).collect()
          .map(r => r.getAs[String]("event_type") ->
            (r.getAs[Long]("cnt"), r.getAs[Double]("total_value"))).toMap
      }
    assert(run(rocks = true) === run(rocks = false))
    // the conf wrapper restored the provider
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass").isEmpty ||
      !spark.conf.get("spark.sql.streaming.stateStore.providerClass").contains("RocksDB"))
  }

  test("withShufflePartitions restores the session value even when body throws") {
    // every streaming entry wraps its impl in this helper; a restore miss
    // would silently change state-store counts for every later query
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    var inside = ""
    intercept[RuntimeException] {
      StreamingConf.withShufflePartitions(spark, 7) {
        inside = spark.conf.get(key)
        throw new RuntimeException("boom")
      }
    }
    assert(inside === "7")
    assert(spark.conf.get(key) === before)
  }

  test("withNoDataBatches restores the session value even when body throws") {
    // a restore miss would silently skip finalization batches for every
    // later streaming query in the session — including the left-outer
    // join, whose null-side rows only emit on the no-data eviction batch
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val before = spark.conf.get(key)
    var inside = ""
    intercept[RuntimeException] {
      StreamingConf.withNoDataBatches(spark, enabled = false) {
        inside = spark.conf.get(key)
        throw new RuntimeException("boom")
      }
    }
    assert(inside === "false")
    assert(spark.conf.get(key) === before)
  }

  test("batch sessionize agrees with stateful fold on the same events") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, 1000L, 1.0), (1L, 2L, 1500L, 2.0), (1L, 3L, 999999L, 3.0),
      (2L, 4L, 50L, 4.0)
    ).toDF("user_id", "event_id", "ts_us", "value")
    val batch = graft.ops.Sessions.sessionize(events, gapMicros = 1000L)
    // 1ms gap: user 1 → sessions {1,2} and {3}; user 2 → {4}
    assert(batch.count() === 3)
    val s1 = batch.filter(col("user_id") === 1 && col("session_seq") === 1).head()
    assert(s1.getAs[Long]("n_events") === 2L)
  }
}
