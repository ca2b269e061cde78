package graft.etl

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  import spark.implicits._
  import DataQuality._

  test("report counts violations per check; clean checks report zero") {
    val child = Seq((1L, "x"), (1L, "y"), (2L, "x"), (3L, "zz")).toDF("k", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = report(Seq(
      Check("dup_keys", unique(child, Seq("k"))),
      Check("orphans", orphans(child, "k", parent, "pk")),
      Check("accepted", acceptedValues(child, "v", Seq("x", "y"))),
      Check("clean", child.filter("false"))))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map(
      "dup_keys" -> 2L,   // both rows of key 1
      "orphans" -> 1L,    // key 3
      "accepted" -> 1L,   // "zz"
      "clean" -> 0L))
  }
}
