package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TopKSpec extends SparkSpec {

  test("aggregator top-k equals the window row_number idiom, across partitionings") {
    val orders = Tables(spark, sf(), "orders")
    val viaAgg = TopK.perGroup(orders, "o_orderstatus", "o_totalprice", "o_orderkey", k = 5)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
    assert(viaAgg.count() > 0)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // partial aggregation must be partition-independent
    val repartitioned = TopK.perGroup(
      orders.repartition(13), "o_orderstatus", "o_totalprice", "o_orderkey", k = 5)
    assert(repartitioned.exceptAll(viaAgg).isEmpty)
  }

  test("ties resolve by id ascending (deterministic)") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 3L), ("g", 1.0, 1L), ("g", 1.0, 2L), ("g", 0.5, 4L))
      .toDF("grp", "score", "id")
    val top = TopK.perGroup(df, "grp", "score", "id", k = 2).collect()
    assert(top.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    assert(top.map(_.getLong(1)).toSeq === Seq(1L, 2L)) // rn
  }
}
