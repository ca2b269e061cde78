package graft

/** The events-epoch derivations assert the session timezone themselves
  * (ADVICE r9): a non-UTC session would otherwise silently shift every
  * NTZ→LTZ-cast epoch instead of failing.
  */
class UtcGuardSpec extends SparkSpec {

  private def withTz[T](tz: String)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try f finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("UTC spellings all pass the guard") {
    Seq("UTC", "GMT", "Etc/UTC", "+00:00", "Z").foreach { tz =>
      withTz(tz)(Tables.requireUtcSession(spark, "spec"))
    }
  }

  test("eventsRaw refuses a non-UTC session") {
    withTz("America/New_York") {
      val e = intercept[IllegalArgumentException] {
        QueryCatalog.eventsRaw(spark, sf())
      }
      assert(e.getMessage.contains("America/New_York"))
    }
    // and works again once restored
    assert(QueryCatalog.eventsRaw(spark, sf()).columns.contains("ts_us"))
  }

  test("streaming entries refuse a non-UTC session") {
    withTz("Asia/Tokyo") {
      intercept[IllegalArgumentException] {
        streaming.EventsStream.hourlyCounts(spark, sf())
      }
      intercept[IllegalArgumentException] {
        streaming.EventsStream.purchaseClickLeftJoin(spark, sf())
      }
      // the epochOk NTZ filter (r11 epoch contract) is epoch-aligned only
      // in UTC — the other two watermarked entries must refuse too
      intercept[IllegalArgumentException] {
        streaming.EventsStream.dedupedCounts(spark, sf())
      }
      intercept[IllegalArgumentException] {
        streaming.EventsStream.purchaseClickJoin(spark, sf())
      }
    }
  }
}
