package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar spine / gap fill: turn a sparse fact stream into a dense
  * per-key time series with zero-filled missing periods — the standard mart
  * shape for trend reporting and feature windows (a model reading "orders
  * per month" must see the zero months).
  *
  * Shape: the spine is `explode(sequence(start, end, interval))` over the
  * DISTINCT keys — |keys| × |periods| rows, built without a cartesian-join
  * plan node. The fact side aggregates BEFORE the join (groups, not rows),
  * so the outer join runs on two group-sized inputs; at 100 TB the join key
  * (key, period) is the same partitioning the aggregate already produced,
  * and AQE broadcasts the spine when |keys|×|periods| is small.
  */
object DateSpine {

  /** Monthly activity per key over [startMonth, endMonth] (inclusive,
    * 'yyyy-MM-dd' first-of-month strings), zero-filled: (key, month, n_rows,
    * total) where total = moneySum(valueCol) or 0.0 for gap months.
    * Facts outside the range are ignored for the AGGREGATE, but the spine
    * carries every key seen anywhere in `facts` — a key whose activity all
    * falls outside the range still gets its all-zero months (review r9: a
    * spine derived from in-range facts only silently dropped such keys,
    * truncating exactly the trend series the zero-fill exists for). Callers
    * with a key dimension table can union its keys into `facts` to spine
    * never-active keys too.
    */
  def monthlyFill(facts: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      startMonth: String, endMonth: String): DataFrame = {
    val month = date_trunc("month", col(tsCol)).cast("date")
    val inRange = facts
      .filter(col(tsCol) >= lit(startMonth) && month <= lit(endMonth))
      .withColumn("month", month)
    val monthly = inRange
      .groupBy(col(keyCol), col("month"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Cols.moneySum(col(valueCol)).as("total"))
    val spine = facts.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(expr(
        s"sequence(DATE'$startMonth', DATE'$endMonth', interval 1 month)")).as("month"))
    spine.join(monthly, Seq(keyCol, "month"), "left_outer")
      .select(col(keyCol), col("month"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("total"), lit(0.0)).as("total"))
  }
}
