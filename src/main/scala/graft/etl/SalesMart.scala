package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Cols

/** Sales-team monthly totals + rank-1 incentive mart.
  *
  * Reference semantics (src/main/transformations/sales_mart_sql_transformation_file.py:11-39):
  * per (store, salesperson, month) total via window sum + distinct, then
  * `rank()` per (store, month) by total desc, and incentive = 1% of the
  * month's total for the rank-1 seller, else 0. (The reference's comment says
  * "top 1% performers" but the code implements rank==1 — we implement the
  * code's semantics, see SURVEY.md §2.8.)
  *
  * Transplanted onto the testdata: store → c_nationkey, salesperson →
  * o_custkey, money → o_totalprice.
  *
  * Scale notes: the total is a groupBy (single shuffle, map-side combine),
  * not the reference's window+distinct. The rank window re-shuffles on
  * (store_id, sales_month) — unavoidable for ranking, but it runs over the
  * *aggregated* rows (|stores|×|sellers|×|months|, orders of magnitude
  * smaller than the fact), so the sort is cheap even at 100 TB of facts.
  */
object SalesMart {

  /** Per (store, salesperson, month) total sales. */
  def monthlyTotals(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .groupBy(
        col("c_nationkey").as("store_id"),
        col("o_custkey").as("sales_person_id"),
        Cols.monthBucket(col("o_orderdate")).as("sales_month"))
      .agg(Cols.moneySum(col("o_totalprice")).as("total_sales"))

  /** Rank per (store, month) by total desc; rank-1 earns 1% incentive.
    * Rank (not row_number) so ties share rank 1 deterministically.
    * (reference: sales_mart_sql_transformation_file.py:24-30)
    */
  def withIncentive(totals: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("store_id"), col("sales_month"))
      .orderBy(col("total_sales").desc)
    totals
      .withColumn("rnk", rank().over(w).cast(LongType))
      .withColumn(
        "incentive",
        when(col("rnk") === 1, col("total_sales") * lit(0.01)).otherwise(lit(0.0)))
  }

  def build(orders: DataFrame, customer: DataFrame): DataFrame =
    withIncentive(monthlyTotals(orders, customer))
}
