package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval / occupancy analytics: how many intervals are active at each
  * point of a calendar grid, and the per-period peak.
  *
  * Scale shape — the textbook sweep-line (±1 events + a running sum over a
  * GLOBAL time order) collapses into a single-partition window in Spark.
  * When the interval length is bounded (here: `lengthDays`), the distributed
  * form is a bounded explode: each interval emits one row per covered grid
  * cell (≤ lengthDays rows), and occupancy is a plain hash aggregate on the
  * cell — map-side combined, shuffles only (cell, partial count), no global
  * order anywhere. A 100 TB fact table with week-bounded intervals expands
  * ≤7× in the map phase and aggregates to |distinct days| rows.
  */
object Intervals {

  /** Per-day active-interval counts for `[startDate, startDate+lengthDays)`
    * intervals. Returns (day DATE, n_active).
    */
  def dailyOccupancy(df: DataFrame, startCol: Column, lengthDays: Int): DataFrame = {
    require(lengthDays >= 1, s"lengthDays=$lengthDays must be positive")
    df.select(explode(sequence(
        startCol.cast("date"),
        date_add(startCol.cast("date"), lengthDays - 1),
        expr("INTERVAL 1 DAY"))).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Monthly peak concurrency over [[dailyOccupancy]]: for each month the
    * maximum simultaneous-active count and the number of active days.
    * Second aggregate re-shuffles DAYS (tiny), not intervals.
    */
  def monthlyPeak(df: DataFrame, startCol: Column, lengthDays: Int): DataFrame =
    dailyOccupancy(df, startCol, lengthDays)
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
      .agg(max(col("n_active")).as("peak_active"),
        count(lit(1)).as("active_days"))
}
