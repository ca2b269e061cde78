package graft.streaming

import org.apache.spark.sql.functions._

import graft.{QueryCatalog, SparkSpec}

/** Stream-stream LEFT OUTER join: the null side must actually emit (state
  * drains at AvailableNow finalization), and below the completeness cutoff
  * the streamed result equals the batch left join computed independently.
  */
class LeftOuterJoinSpec extends SparkSpec {

  test("unmatched purchases emit with null click; result equals the batch twin") {
    val res = EventsStream.purchaseClickLeftJoin(spark, sf())
      .persist()
    try {
      val unmatched = res.filter(col("click_id").isNull).count()
      assert(unmatched > 0, "no null-side rows — the outer join degenerated to inner")

      val ev = QueryCatalog.eventsTable(spark, sf())
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts_us").as("c_us"))
      // 150 min = watermark delay 1 h + join-range span 1 h + 30 min
      // margin — the span term mirrors Spark's state-VALUE watermark
      // eviction of unmatched left rows (see purchaseClickLeftJoin doc)
      val cutoff = p.agg(max("p_us")).head.getLong(0)
        .min(c.agg(max("c_us")).head.getLong(0)) - 9000000000L
      val batch = p
        .join(c, col("user_id") === col("c_user") &&
          col("c_us") >= col("p_us") - 3600000000L && col("c_us") <= col("p_us"),
          "left_outer")
        .filter(col("p_us") < cutoff)
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          (floor(col("p_us") / 1000000L) - floor(col("c_us") / 1000000L)).as("lag_secs"))
      assert(res.count() === batch.count())
      assert(res.exceptAll(batch).isEmpty && batch.exceptAll(res).isEmpty)
    } finally res.unpersist()
  }
}
