package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-corpus curation — the end-to-end hygiene pass a
  * pre-training pipeline runs before sharding, built entirely from the
  * engine's own operators:
  *
  *  1. quality gate  — [[TextAnalysis.qualityFilter]] hard rules (map-only)
  *  2. exact dedup   — [[Dedup.dropExactDuplicates]] (one hash shuffle)
  *  3. decontaminate — [[Decontamination.contaminated]] vs a benchmark set
  *                     (benchmark grams broadcast; corpus never shuffles)
  *  4. split assign  — deterministic md5 buckets (map-only, engine-portable)
  *
  * Every stage is SQL-replayable, so the WHOLE composition is oracle-checked
  * end-to-end (`corpus_curation`) — the integration twin of the per-stage
  * gates. At 100 TB the only shuffle is the dedup hash-group; stages 1/3/4
  * are map-side against broadcast state.
  */
object CorpusPipeline {

  /** Curated corpus: quality-kept, exact-deduped, decontaminated docs with
    * their split assignment. `benchmark` is the eval corpus to scrub
    * against; `n` is the contamination gram length.
    * `requireTerminalPunct` toggles the C4 sentence-final-punctuation rule —
    * appropriate for prose crawls, wrong for corpora whose documents are
    * legitimately unpunctuated (logs, titles, code; the synthetic testdata).
    */
  def curate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
      requireTerminalPunct: Boolean = true): DataFrame = {
    val qf = TextAnalysis.qualityFilter(docs)
    val rules = col("enough_words") && col("sane_word_len") &&
      col("no_giant_word") && col("has_stopword") &&
      (if (requireTerminalPunct) col("terminal_punct") else lit(true))
    val qualityKept = qf.filter(rules).select(col("doc_id"))
    val deduped = Dedup.dropExactDuplicates(docs.join(qualityKept, "doc_id"))
    val contaminatedIds = Decontamination.contaminated(deduped, benchmark, n)
      .select(col("doc_id"))
    val clean = deduped.join(contaminatedIds, Seq("doc_id"), "left_anti")
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    clean.withColumn("split",
      when(h < "0a", "test").when(h < "14", "val").otherwise("train"))
  }
}
