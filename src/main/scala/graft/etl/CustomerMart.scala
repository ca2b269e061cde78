package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.Cols

/** Customer monthly-purchases mart.
  *
  * Reference semantics (src/main/transformations/customer_mart_sql_tranform_write.py:10-27):
  * month-bucket the sale date, windowed `sum(total_cost) OVER (PARTITION BY
  * customer_id, month)`, project (id, full_name, month, total), `distinct()`.
  *
  * Transplanted onto the testdata star schema: `orders` is the fact
  * (o_totalprice = the money column), `customer` the dimension. Two variants:
  *
  *  - [[monthlyPurchases]]: idiomatic `groupBy().agg()` — one partial+final
  *    hash aggregate, map-side combine, single shuffle on the group keys.
  *    This is what you want at 100 TB.
  *  - [[monthlyPurchasesWindowIdiom]]: the reference's window+distinct idiom,
  *    kept to prove W1/A3 parity. Costs a window shuffle PLUS a full-row
  *    hash-distinct — strictly worse physically, identical results.
  */
object CustomerMart {

  /** Idiomatic mart: join + groupBy. Join key o_custkey=c_custkey; customer
    * is ~1% the size of orders so Catalyst broadcast-joins it at any sf
    * (dim side stays under autoBroadcastJoinThreshold until ~100M customers;
    * past that AQE converts to shuffled hash join on the same plan).
    */
  def monthlyPurchases(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .groupBy(
        col("c_custkey").as("customer_id"),
        col("c_name").as("full_name"),
        Cols.monthBucket(col("o_orderdate")).as("sales_month"))
      .agg(Cols.moneySum(col("o_totalprice")).as("total_sales"))

  /** Reference-idiom mart: unordered window sum (whole-partition frame) then
    * distinct. Verifiably identical output to [[monthlyPurchases]].
    * (reference: customer_mart_sql_tranform_write.py:11-20)
    */
  def monthlyPurchasesWindowIdiom(orders: DataFrame, customer: DataFrame): DataFrame = {
    val joined = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .withColumn("sales_month", Cols.monthBucket(col("o_orderdate")))
    val w = Window.partitionBy(col("c_custkey"), col("sales_month"))
    joined
      .withColumn(
        "total_sales",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("full_name"),
        col("sales_month"),
        col("total_sales"))
      .distinct()
  }
}
