package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertScd2Spec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, unmatched survive, new keys append") {
    val cur = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val upd = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val got = Upsert.upsert(cur, upd, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert rejects schema mismatch") {
    val cur = Seq((1L, "a")).toDF("k", "name")
    val upd = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException](Upsert.upsert(cur, upd, Seq("k")))
  }

  test("scd2: re-stated values collapse, valid_to chains, current version open") {
    val changes = Seq(
      (1L, "gold", 100L, 1L),
      (1L, "gold", 200L, 2L),   // re-stated -> collapsed
      (1L, "silver", 300L, 3L),
      (1L, "gold", 400L, 4L),   // back to gold -> NEW version
      (2L, "bronze", 150L, 5L)
    ).toDF("k", "tier", "ts", "seq")
    val got = Scd2.versions(changes, "k", "tier", "ts", "seq")
      .orderBy("k", "valid_from")
      .select("k", "tier", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, "gold", 100L, 300L),
      (1L, "silver", 300L, 400L),
      (1L, "gold", 400L, -1L),
      (2L, "bronze", 150L, -1L)))
  }

  test("scd2: changes to null version, restated nulls collapse (null-safe compare)") {
    // review r9: the null-unsafe =!= dropped the attribute CLEARING (change
    // to null never versioned) and minted a duplicate version for a
    // restated null (lag's "no previous" and "previous was null" collide)
    val changes = Seq(
      (1L, Some("gold"), 100L, 1L),
      (1L, None, 200L, 2L),          // cleared -> must be a new version
      (1L, None, 300L, 3L),          // restated null -> collapsed
      (1L, Some("silver"), 400L, 4L),
      (2L, None, 50L, 5L),           // first version IS null -> kept
      (2L, None, 60L, 6L)            // restated -> collapsed
    ).toDF("k", "tier", "ts", "seq")
    val got = Scd2.versions(changes, "k", "tier", "ts", "seq")
      .orderBy("k", "valid_from")
      .select("k", "tier", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "<null>" else r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, "gold", 100L, 200L),
      (1L, "<null>", 200L, 400L),
      (1L, "silver", 400L, -1L),
      (2L, "<null>", 50L, -1L)))
  }

  test("funnel: depth counts stages only in first-occurrence order") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: clicked before ever viewing -> depth 1
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // user 3: view only
      (3L, "view", 1L),
      // user 4: no funnel stages at all
      (4L, "error", 1L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = graft.ops.Sessions.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "funnel_depth").as[(Long, Int)].collect().toSeq
    assert(got === Seq((1L, 3), (2L, 1), (3L, 1), (4L, 0)))
  }
}
