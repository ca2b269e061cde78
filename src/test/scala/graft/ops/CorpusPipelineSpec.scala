package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val good =
    "the quick brown fox and the lazy dog walked to the park with great joy today"

  test("curate drops low-quality, duplicate, and contaminated docs; keeps the rest") {
    val docs = Seq(
      (1L, good),                     // kept
      (2L, good),                     // exact duplicate of 1 → dropped
      (3L, "short"),                  // fails quality (too few words)
      (4L, "the benchmark sentence with exactly eight shared tokens inside it and more words of padding"),
      (5L, good + " but this tail makes it a distinct document in the corpus")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the benchmark sentence with exactly eight shared tokens inside it and nothing else at all")
    ).toDF("doc_id", "text")
    val kept = CorpusPipeline.curate(docs, benchmark, n = 8,
      requireTerminalPunct = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 4 shares the 8-gram "the benchmark sentence ... inside it" → contaminated
    assert(kept === Set(1L, 5L))
  }

  test("every kept doc carries a split assignment") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"${good} variant number $i")).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, docs.limit(0), n = 8,
      requireTerminalPunct = false)
    assert(out.filter(col("split").isNull).isEmpty)
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
  }
}
