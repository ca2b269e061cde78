package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log (key, attribute,
  * event time) into versioned rows [valid_from, valid_to), valid_to null for
  * the current version. Consecutive rows with an unchanged attribute are
  * collapsed first (a re-stated identical value is not a new version).
  *
  * Two window passes over (key, ts) — each is one shuffle on the key and a
  * per-partition sort; nothing else moves. At 100 TB of change log the
  * shuffle is the cost floor for any per-key ordered computation; if the log
  * is already bucketed by key, the exchange disappears.
  */
object Scd2 {

  /** @param tieBreak extra ordering column for same-timestamp changes —
    *        REQUIRED for determinism when a key can change twice in one tick
    */
  def versions(changes: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    // null-SAFE change compare, with row_number disambiguating "no previous
    // row" from "previous attr was null" (review r9: the null-unsafe =!=
    // dropped changes TO null — the attribute clearing never versioned —
    // and a restated null minted a duplicate version via lag's ambiguity)
    val collapsed = changes
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attr)))
      .drop("__rn")
    collapsed
      .select(col(key), col(attr), col(ts).as("valid_from"), col(tieBreak))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col(key)).orderBy(col("valid_from"), col(tieBreak))))
      .drop(tieBreak)
  }
}
