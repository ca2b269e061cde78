package graft

/** Plan-shape assertions for round-7 queries: the point of these entries is
  * not only the answer but the PLAN — broadcasts where a dim is small,
  * top-k as TakeOrderedAndProject, codegen kernels inside the join. These
  * specs pin the shapes so a regression (e.g. a broadcast silently falling
  * back to shuffle) fails loudly.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val run = QueryCatalog.all.find(_.name == name).get.run
    run(spark, sf()).queryExecution.executedPlan.toString
  }

  test("tpch_q7 broadcasts both nation dims (no dim shuffle)") {
    val p = planOf("tpch_q7")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("weighted_sample is a TakeOrderedAndProject (per-partition k-heaps)") {
    val p = planOf("weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("jaro_winkler_pairs runs the codegen kernel inside a broadcast join") {
    val p = planOf("jaro_winkler_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("jaro_winkler"), p.take(2000))
  }

  test("zorder_clustering is map-side bit math + one aggregate (no join)") {
    val p = planOf("zorder_clustering")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }
}
