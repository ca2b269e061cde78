package graft.etl

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** One-pass pipeline instrumentation via `Dataset.observe`: row counts and
  * quality tallies computed DURING the action that materializes the frame —
  * no second scan, no `count()` job per metric. At 100 TB an extra
  * metrics pass costs a full read; observed metrics cost nothing beyond the
  * write that already runs.
  *
  * Usage: `val (df2, obs) = Metrics.withRowMetrics(df, "ingest", "id")`,
  * run the action (write/collect), then `obs.get` returns the metric map.
  */
object Metrics {

  /** Attach standard ingest metrics: total rows, null-key rows, and rows
    * failing an optional predicate (e.g. a DQ rule) — all folded into the
    * next action over the returned frame.
    */
  def withRowMetrics(df: DataFrame, name: String, keyCol: String,
      violation: Option[org.apache.spark.sql.Column] = None): (DataFrame, Observation) = {
    val obs = new Observation(name)
    // coalesce: sum() over an EMPTY frame is SQL NULL while count is 0 — a
    // zero-row batch would hand callers a null metric to trip over
    // (review r9)
    val base = Seq(
      count(lit(1)).as("n_rows"),
      coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_keys"))
    val metrics = violation
      .map(v => base :+
        coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as("n_violations"))
      .getOrElse(base)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
