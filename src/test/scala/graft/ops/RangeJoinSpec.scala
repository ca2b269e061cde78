package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (10L, 0.0, 10.0),   // [0, 10)
    (11L, 5.0, 15.0),   // overlaps 10
    (12L, 20.0, 20.5)   // narrower than the bucket width
  ).toDF("iv_id", "lo", "hi")

  test("point matches every covering interval; bounds are half-open") {
    val points = Seq((1L, 7.0), (2L, 10.0), (3L, 0.0), (4L, 20.5), (5L, 99.0))
      .toDF("p_id", "v")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", bucketWidth = 4.0)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 10L), (1L, 11L), // 7 in [0,10) and [5,15)
      (2L, 11L),            // 10 excluded from [0,10) (hi exclusive), in [5,15)
      (3L, 10L)             // lo inclusive
      // 4: 20.5 excluded from [20,20.5); 5: no interval
    ))
  }

  test("bucketized result equals the naive range join") {
    val points = spark.range(0, 400)
      .select(col("id").as("p_id"), (col("id") % 37 * 0.7).as("v"))
    val naive = points.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    val bucketed = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", bucketWidth = 3.0)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
  }
}
