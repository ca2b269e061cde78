package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated by any other row,
  * where q dominates p iff `q.cost ≤ p.cost ∧ q.gain ≥ p.gain` with at
  * least one strict. The classic "cheapest-for-its-quality" cut used to
  * pick representative documents / configs.
  *
  * Scale shape — NOT the O(n²) NOT-EXISTS self-join. Dominance only flows
  * through the per-cost maxima: a row survives iff (a) it has the max gain
  * within its own cost group (ties all survive — equal points don't
  * dominate each other) and (b) that group max strictly exceeds the best
  * gain among all strictly-cheaper groups. So: one hash aggregate to
  * |distinct costs| rows, one running-max window over those group rows
  * (tiny — the value grid, not the data), one broadcast join back. The
  * n² comparison never happens and nothing but the group frame needs a
  * global order.
  */
object Skyline {

  /** Pareto-optimal rows of `df` minimizing `costCol` and maximizing
    * `gainCol`. Returns the original rows (all columns).
    */
  def paretoFrontier(df: DataFrame, costCol: Column, gainCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rows with a null cost or gain are EXCLUDED (the rank-family null
    // contract): a null-cost group sorts FIRST in the running-max window,
    // so its gain would suppress every real group while the null row itself
    // never survives the null-unsafe join-back — one null row made the
    // whole frontier come back empty (review r9)
    val rows = df.filter(costCol.isNotNull && gainCol.isNotNull)
    val groups = rows.groupBy(costCol.as("__cost"))
      .agg(max(gainCol).as("__gmax"))
    val w = Window.orderBy(col("__cost")).rowsBetween(Window.unboundedPreceding, -1)
    val frontierCosts = groups
      .withColumn("__prefix", max(col("__gmax")).over(w))
      // strictly better than every strictly-cheaper group's best
      .filter(col("__prefix").isNull || col("__gmax") > col("__prefix"))
      .select(col("__cost"), col("__gmax"))
    rows.join(broadcast(frontierCosts),
        costCol === col("__cost") && gainCol === col("__gmax"))
      .drop("__cost", "__gmax")
  }
}
