package graft.ops

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option("a")), (2L, Option("a")), (3L, None), (4L, Option("b"))
  ).toDF("id", "v")

  test("profile counts rows, non-nulls, and exact distincts per column") {
    val r = Profiler.profile(df, Seq("id", "v")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("id") === ((4L, 4L, 4L)))
    assert(r("v") === ((4L, 3L, 2L)))   // one null; distinct ignores it
  }

  test("approxProfile matches exact at tiny cardinalities") {
    val r = Profiler.approxProfile(df, Seq("v")).collect().head
    assert(r.getLong(3) === 2L)
  }
}
