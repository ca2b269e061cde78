package graft.etl

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDateSpineSpec extends SparkSpec {

  import spark.implicits._

  test("snapshot diff classifies insert/delete/update and drops unchanged") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after  = Seq((1L, "a"), (2L, "bb"), (4L, "d")).toDF("k", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("snapshot diff attribute compare is null-safe") {
    val before = Seq((5L, Option("x")), (6L, None: Option[String])).toDF("k", "v")
    val after  = Seq((5L, None: Option[String]), (6L, None: Option[String])).toDF("k", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // null→null is unchanged (dropped); x→null is an update, not unknown
    assert(got === Map(5L -> "update"))
  }

  test("snapshot diff rejects mismatched schemas") {
    val before = Seq((1L, "a")).toDF("k", "v")
    val after  = Seq((1L, "a")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(before, after, Seq("k"))
    }
  }

  test("CDC roundtrip: applyChanges(before, diffRows(before, after)) == after") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "x")
    val after  = Seq((1L, "a", 10), (2L, "bb", 21), (4L, "d", 40)).toDF("k", "v", "x")
    val feed = SnapshotDiff.diffRows(before, after, Seq("k"))
    val types = feed.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(types === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    val rebuilt = SnapshotDiff.applyChanges(before, feed, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = after.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(rebuilt === want)
  }

  test("date spine zero-fills gap months and ignores out-of-range facts") {
    val facts = Seq(
      (1L, "1995-01-15", 10.0),  // Jan
      (1L, "1995-01-20", 5.0),   // Jan again
      (1L, "1995-03-02", 7.0),   // Mar — Feb is a gap
      (1L, "1994-12-31", 99.0),  // before range: ignored
      (1L, "1996-01-01", 99.0),  // after range: ignored
      (2L, "1995-06-10", 3.0)
    ).toDF("k", "d", "amt").withColumn("d", col("d").cast("date"))
    val spine = DateSpine.monthlyFill(facts, "k", "d", "amt",
      "1995-01-01", "1995-12-01")
    // dense: 2 keys × 12 months
    assert(spine.count() === 24)
    val k1 = spine.filter(col("k") === 1).collect()
      .map(r => r.getAs[Date]("month").toString ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("total"))).toMap
    assert(k1("1995-01-01") === (2L, 15.0))
    assert(k1("1995-02-01") === (0L, 0.0))   // gap month zero-filled
    assert(k1("1995-03-01") === (1L, 7.0))
    assert(k1("1995-12-01") === (0L, 0.0))
  }
}
