package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("backward as-of join picks the latest value at-or-before, per key") {
    val left = Seq(
      (1L, 10L, 100L), // before any right row → null
      (2L, 10L, 250L), // after right@200 → 2.0
      (3L, 10L, 300L), // simultaneous with right@300 → 3.0 (right wins tie)
      (4L, 20L, 999L)  // other key, no right rows → null
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (100L, 10L, 200L, 2.0),
      (101L, 10L, 300L, 3.0),
      (102L, 30L, 50L, 9.0)
    ).toDF("event_id", "user_id", "ts_us", "value")

    val got = AsOf.join(left, right, "user_id", "ts_us", "event_id", "value")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("asof_value"))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(2.0))
    assert(got(3L).contains(3.0))
    assert(got(4L).isEmpty)
  }

  test("a genuinely-null right value is the observation, not skipped (merge_asof)") {
    // review r9: a bare ignore-nulls carry skipped the null-valued right
    // row and resurfaced the older 5.0 — merge_asof semantics say the most
    // recent observation at t=2 is null
    val left = Seq((1L, 10L, 3L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (100L, 10L, 1L, Some(5.0)),
      (101L, 10L, 2L, None)
    ).toDF("event_id", "user_id", "ts_us", "value")
    val got = AsOf.join(left, right, "user_id", "ts_us", "event_id", "value")
      .head()
    assert(got.isNullAt(got.fieldIndex("asof_value")))
  }
}
