package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-capacity context-window bins.
  *
  * The rule is cumulative-sum binning: within each `groupCol` stream,
  * documents are taken in `idCol` order and document d lands in bin
  * floor(cumsum_before(d) / capacity) — i.e. bins are filled left to right
  * and a document that straddles a boundary goes to the bin its first token
  * falls in (so a bin can overflow by at most one document; callers that
  * need hard caps split oversize docs first).
  *
  * Why this rule and not first-fit: it is ORDER-DETERMINISTIC and
  * WINDOW-EXPRESSIBLE — one partitioned running sum, no sequential driver
  * loop — so it scales as a single shuffle-and-scan over the corpus and the
  * exact same semantics run in any SQL engine (the correctness oracle).
  * Greedy first-fit-decreasing packs marginally tighter but is inherently
  * sequential per bin set.
  */
object Packing {

  /** (group, doc_id, size, start_offset, bin_id) — start_offset = start
    * position of the doc inside its group's concatenated token stream.
    */
  def packSequences(docs: DataFrame, capacity: Long,
      sizeCol: String = "n_chars", groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(groupCol), col(idCol), col(sizeCol).cast("long").as("size"))
      .withColumn("start_offset", sum(col("size")).over(w) - col("size"))
      // integer div, not floor(long / long): Spark's `/` on longs goes
      // through DOUBLE, which loses ulps past 2^53 — a group whose stream
      // passes ~9e15 tokens would misplace boundary docs (review r9)
      .withColumn("bin_id", expr(s"start_offset div CAST($capacity AS BIGINT)"))
  }
}
