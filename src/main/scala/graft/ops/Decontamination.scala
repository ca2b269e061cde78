package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a benchmark/eval corpus — the standard pre-training hygiene
  * pass (remove eval contamination before training).
  *
  * Scale shape: the benchmark side is always tiny relative to the training
  * corpus (millions of eval grams vs 100 TB of text), so its distinct gram
  * set BROADCASTS; training docs stream map-side through gram generation →
  * broadcast hash join → per-doc count. The training text never shuffles —
  * only (doc_id, matched-gram) rows survive the join, and those are rare by
  * construction.
  *
  * Grams here are the literal space-joined token strings (not hashes) so the
  * exact same semantics run in the SQL oracle; a production pass at 100 TB
  * would hash grams to 8-byte keys first ([[graft.functions.TextSketches]])
  * to shrink the broadcast and the join keys.
  */
object Decontamination {

  /** Distinct word n-grams per document: explode window starts, slice the
    * materialized token array in a codegen'd projection (no per-element
    * lambdas — see Shingles' performance contract).
    */
  def wordGrams(docs: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    wordGramsRaw(docs, n, textCol, idCol).distinct()

  /** [[wordGrams]] WITHOUT the per-doc dedup — map-only, nothing shuffles.
    * The join path below needs this form: a distinct here would hash-
    * exchange every training gram BEFORE the broadcast join (review r9),
    * which is exactly the shuffle the module's scale contract forbids.
    */
  private def wordGramsRaw(docs: DataFrame, n: Int,
      textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("norm", Shingles.normalize(col(textCol)))
      .withColumn("toks", Shingles.tokensOfNorm(col("norm")))
      .filter(size(col("toks")) >= n)
      .select(col(idCol).as("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - lit(n - 1))).as("pos"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("pos"), lit(n))).as("gram"))

  /** Training docs sharing ≥ `minShared` distinct n-grams with the benchmark
    * corpus: (doc_id, shared_grams). `benchmark`'s gram set is broadcast.
    * Train-side grams stream RAW (repeats included) into the broadcast join
    * and dedup AFTER it via count_distinct — only matched rows (rare by
    * construction) ever aggregate, so the training corpus truly never
    * shuffles; identical counts to dedup-before-join.
    */
  def contaminated(train: DataFrame, benchmark: DataFrame, n: Int = 8,
      minShared: Int = 1, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val benchGrams = wordGrams(benchmark, n, textCol, idCol)
      .select(col("gram")).distinct()
    wordGramsRaw(train, n, textCol, idCol)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }
}
