package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right value at-or-before
  * its time, per key (backward as-of, pandas merge_asof semantics).
  *
  * Spark has no native as-of operator; the scalable composition (preference
  * (a) of the custom-operator ladder — compose built-ins) is:
  * union both sides tagged → one shuffle+sort per key → ignore-nulls
  * last-value carry-forward → filter back to left rows. Cost is a single
  * sort pass — no per-row range probe, no broadcast of either side. This is
  * the same physical shape a dedicated AsOfJoinExec would produce, so a
  * custom SparkPlan is not warranted (SURVEY.md §7.3).
  */
object AsOf {

  /** Attach to every left row the latest `valueCol` from `right` with
    * right.time ≤ left.time on the same key. Ties at the same instant order
    * the right row first (its value is visible to the left row); `seqCol`
    * breaks remaining ties deterministically. Times are longs (any unit).
    *
    * Rows with a NULL time are EXCLUDED on both sides: "most recent
    * at-or-before" is undefined against a missing instant (pandas
    * merge_asof rejects null keys outright), and leaving them in
    * diverges engines — Spark windows sort NULLs first ascending, SQL
    * dialects last, so a null-time row silently becomes the "earliest"
    * or "latest" observation depending on the engine (fuzz sweep, round
    * 11; same contract as the events-family window queries). Oracles
    * mirror with `WHERE ts IS NOT NULL`.
    *
    * Output: all left columns + `asof_<valueCol>` (null if no prior row).
    */
  def join(left0: DataFrame, right0: DataFrame, keyCol: String, timeCol: String,
      seqCol: String, valueCol: String): DataFrame = {
    val left = left0.filter(col(timeCol).isNotNull)
    val right = right0.filter(col(timeCol).isNotNull)
    val vType = right.schema(valueCol).dataType
    val outCols = left.columns.toSeq
    // the carried marker is a STRUCT wrapping the value, not the bare
    // value: last(ignoreNulls) must skip LEFT rows only — a right row whose
    // value is genuinely null is still "the most recent observation" and
    // merge_asof yields null for it, where a bare-value carry would skip it
    // and resurface an older, stale value (review r9)
    val vStruct = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vType)))
    val leftTagged = left
      .withColumn("__v", lit(null).cast(vStruct))
      .withColumn("__side", lit(1))
      .select((outCols ++ Seq("__v", "__side")).map(col): _*)
    val rightBase = right
      .select(col(keyCol), col(timeCol), col(seqCol),
        struct(col(valueCol).as("v")).as("__v"))
      .withColumn("__side", lit(0))
    val rightTagged = outCols
      .foldLeft(rightBase) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select((outCols ++ Seq("__v", "__side")).map(col): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.union(rightTagged)
      .withColumn(s"asof_$valueCol",
        last(col("__v"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__side", "__v")
  }
}
