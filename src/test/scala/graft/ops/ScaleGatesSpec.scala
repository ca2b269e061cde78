package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{ScaleGates, SparkSpec}

/** The distributed fallback branches ARE the engine at 100 TB; at test
  * scale the driver-local primaries always win the size gates, so without
  * forcing, the fallbacks only run in hand-picked unit tests. This spec
  * pins, for every gated operator, that the forced-distributed branch is
  * RESULT-IDENTICAL to the driver-local primary on the same input — the
  * in-process twin of the full forced-fallback oracle sweep
  * (`scripts/forced_fallback_sweep.sh`, round-11 verdict item 1).
  */
class ScaleGatesSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  /** Run `body` twice — primary gates, then forced-distributed — and
    * assert identical sorted rows. */
  private def bothPaths(label: String)(body: => DataFrame): Unit = {
    assert(!ScaleGates.forceDistributed, "flag leaked from a previous test")
    val primary = sorted(body)
    val forced =
      try { sys.props("graft.forceDistributed") = "true"; sorted(body) }
      finally sys.props.remove("graft.forceDistributed")
    assert(forced == primary, s"$label: forced-distributed branch diverged")
    assert(primary.nonEmpty, s"$label: vacuous comparison (no rows)")
  }

  test("cap() zeroes budgets only under the flag") {
    assert(ScaleGates.cap(42L) == 42L)
    try {
      sys.props("graft.forceDistributed") = "true"
      assert(ScaleGates.cap(42L) == 0L)
      assert(ScaleGates.forceDistributed)
    } finally sys.props.remove("graft.forceDistributed")
    assert(!ScaleGates.forceDistributed)
  }

  private def edges: DataFrame = {
    import spark.implicits._
    // two components + a hub: exercises salting-adjacent shapes and ties
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (1L, 6L), (1L, 7L))
      .toDF("src", "dst")
  }

  test("pageRankTopK: distributed rank loop + SQL render match the vector path") {
    bothPaths("pageRankTopK") {
      Graph.pageRankTopK(edges, "src", "dst", iterations = 3, k = 5,
        renderLocal = n => "n:" + n, renderSql = "concat('n:', CAST(node AS STRING))")
    }
  }

  test("kCore: shuffle-join peeling matches the broadcast path") {
    bothPaths("kCore")(Graph.kCore(edges, k = 2))
  }

  test("triangleStats: shuffle degree joins match the broadcast path") {
    bothPaths("triangleStats")(Graph.triangleStats(
      edges.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst")).distinct()))
  }

  test("connectedComponents: min-label propagation matches union-find (long ids)") {
    bothPaths("connectedComponents[long]")(Dedup.connectedComponents(
      edges.select(col("src").as("doc_a"), col("dst").as("doc_b"))))
  }

  test("connectedComponents: min-label propagation matches union-find (string ids)") {
    import spark.implicits._
    bothPaths("connectedComponents[string]")(Dedup.connectedComponents(
      Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")))
  }

  private def facts: DataFrame = {
    import spark.implicits._
    (1 to 400).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "v", "id")
  }

  test("groupedRanks: shuffle-join offsets match the broadcast path") {
    bothPaths("groupedRanks")(
      Distribution.groupedRanks(facts, "g", col("v"), Seq(col("id"))))
  }

  test("groupedMedianMad: two-pass persist fallback matches the collect path") {
    bothPaths("groupedMedianMad")(
      Distribution.groupedMedianMad(facts, "g", col("v"), Seq(col("id"))))
  }
}
