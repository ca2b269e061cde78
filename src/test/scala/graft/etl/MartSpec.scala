package graft.etl

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MartSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf(), "orders")
  private lazy val customer = Tables(spark, sf(), "customer")

  test("groupBy mart and window-idiom mart are identical") {
    val a = CustomerMart.monthlyPurchases(orders, customer)
    val b = CustomerMart.monthlyPurchasesWindowIdiom(orders, customer)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("customer mart totals sum to the grand total") {
    val mart = CustomerMart.monthlyPurchases(orders, customer)
    val martTotal = mart.agg(sum("total_sales")).head().getDouble(0)
    val factTotal = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .agg(graft.functions.Cols.moneySum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(martTotal - factTotal) < 1e-6 * factTotal)
  }

  test("sales mart: exactly the top seller(s) per (store, month) get rank 1 and 1% incentive") {
    val m = SalesMart.build(orders, customer)
    // every (store, month) group has at least one rank-1 row
    val groups = m.select("store_id", "sales_month").distinct().count()
    val rank1 = m.filter(col("rnk") === 1).select("store_id", "sales_month").distinct().count()
    assert(groups === rank1)
    // rank-1 rows carry max total and incentive = 1% of it; others carry 0
    val bad = m.withColumn("mx",
      max(col("total_sales")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("store_id", "sales_month")))
      .filter(
        (col("rnk") === 1 && (col("total_sales") =!= col("mx") ||
          abs(col("incentive") - col("total_sales") * 0.01) > 1e-9)) ||
        (col("rnk") =!= 1 && col("incentive") =!= 0.0))
    assert(bad.isEmpty)
  }

  test("enrichment three-way join preserves fact row count (FK integrity)") {
    val li = Tables(spark, sf(), "lineitem")
    val enriched = Enrichment.enrich(li, orders, customer)
    assert(enriched.count() === li.count())
    assert(enriched.columns.toSet.contains("customer_name"))
  }
}
