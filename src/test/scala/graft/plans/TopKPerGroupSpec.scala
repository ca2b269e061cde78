package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom top-k-per-group operator: result-equal to the window
  * row_number form, planned as partial+final bounded heaps with the one
  * hash exchange between them — and NO Sort/Window anywhere.
  */
class TopKPerGroupSpec extends SparkSpec {

  import spark.implicits._

  private lazy val orders = Tables(spark, sf(), "orders")

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("matches the window row_number form on a real table (total ordering)") {
    val got = TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val want = windowForm(3)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("plans as partial heap -> exchange -> final heap, no Sort, no Window") {
    val df = TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan.take(2000))
    assert(plan.contains("TopKPerGroupFinal"), plan.take(2000))
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan.take(2000))
    assert(!plan.contains("Sort "), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("map-side partial prunes: per input partition at most k rows per group survive") {
    // 1 group spread over 8 partitions, 400 rows: the partial stage may pass
    // up to 8*k rows, the final heap must return exactly k
    val df = spark.range(400).select(lit(1).as("g"), col("id"))
      .repartition(8)
    val top = TopKPerGroup(df, Seq("g"), Seq(("id", true)), k = 5)
    val rows = top.collect().map(_.getLong(1)).sorted
    assert(rows.toSeq === Seq(395L, 396L, 397L, 398L, 399L))
  }

  test("k >= group size returns every row; ascending order works") {
    val df = Seq(("a", 3), ("a", 1), ("b", 7)).toDF("g", "v")
    val top = TopKPerGroup(df, Seq("g"), Seq(("v", false)), k = 10)
    assert(top.count() === 3)
    val top1 = TopKPerGroup(df, Seq("g"), Seq(("v", false)), k = 1)
    assert(top1.orderBy("g").as[(String, Int)].collect().toSeq ===
      Seq(("a", 1), ("b", 7)))
  }

  test("nulls follow SortOrder default ordering (desc -> nulls last)") {
    val df = Seq(("a", Some(2)), ("a", None), ("a", Some(5))).toDF("g", "v")
    val top = TopKPerGroup(df, Seq("g"), Seq(("v", true)), k = 2)
    assert(top.as[(String, Option[Int])].collect().toSet ===
      Set(("a", Some(5)), ("a", Some(2))))
  }

  test("heap-pressure flush (tiny threshold) still matches the window form") {
    // threshold 2 forces a partial-map drain every 2 groups — several
    // partial outputs per group must merge correctly in the final heap
    spark.conf.set("graft.topk.flushThreshold", "2")
    try {
      val got = TopKPerGroup(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      val want = windowForm(3)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally spark.conf.unset("graft.topk.flushThreshold")
  }
}
