package graft.ops

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("cumsum binning: offsets contiguous per group, straddling doc goes to its start bin") {
    val docs = Seq(
      ("a", 1L, 60L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 100L),
      ("b", 5L, 10L)
    ).toDF("source", "doc_id", "n_chars")
    val got = Packing.packSequences(docs, capacity = 100)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "size", "start_offset", "bin_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 1L, 60L, 0L, 0L),
      ("a", 2L, 30L, 60L, 0L),
      ("a", 3L, 30L, 90L, 0L),   // starts at 90 < 100 → bin 0 even though it straddles
      ("a", 4L, 100L, 120L, 1L),
      ("b", 5L, 10L, 0L, 0L)     // groups pack independently
    ))
  }

  test("every bin start is below capacity boundary of its bin") {
    val docs = spark.range(1, 200)
      .selectExpr("'s' AS source", "id AS doc_id", "(id % 97) + 1 AS n_chars")
    val bad = Packing.packSequences(docs, capacity = 128)
      .filter("start_offset < bin_id * 128 OR start_offset >= (bin_id + 1) * 128")
      .count()
    assert(bad === 0)
  }
}
