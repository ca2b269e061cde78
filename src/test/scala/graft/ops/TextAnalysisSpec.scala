package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "Hello, World! This is a TEST."),
    (2L, "the cat and the dog went to the park"),
    (3L, "der Hund und die Katze sind nicht hier"),
    (4L, "le chat est avec une souris et pas le chien")
  ).toDF("doc_id", "text")

  test("textStats computes exact counts") {
    val r = TextAnalysis.textStats(docs).filter(col("doc_id") === 1).head()
    assert(r.getAs[Long]("n_chars") === 29L)
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Double]("punct_ratio") === 3.0 / 29)   // "," "!" "."
    assert(r.getAs[Double]("upper_ratio") === 7.0 / 29)   // H W T TEST
  }

  test("tokenCounts: ws vs lexical tokens") {
    val r = TextAnalysis.tokenCounts(docs).filter(col("doc_id") === 1).head()
    assert(r.getAs[Long]("ws_tokens") === 6L)
    // Hello , World ! This is a TEST . → 9 lexical tokens
    assert(r.getAs[Long]("lex_tokens") === 9L)
  }

  test("languageId picks the marker-dominant language") {
    val preds = TextAnalysis.languageId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(preds(2L) === "en")
    assert(preds(3L) === "de")
    assert(preds(4L) === "fr")
  }

  test("tfidf: corpus-common terms rank below document-specific terms") {
    val corpus = Seq(
      (1L, "spark spark spark shared shared"),
      (2L, "duckdb duckdb shared shared"),
      (3L, "parquet shared")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(corpus, m = 2).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    // 'shared' appears in all 3 docs → idf ln(4/4)=0 → weight 0, never #1
    assert(top(1L).head === "spark")
    assert(top(2L).head === "duckdb")
    assert(top(3L).head === "parquet")
  }

  test("fingerprint overlap pairs surface the exact-dup pair at overlap 1.0") {
    val trio = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence with other words entirely")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.fingerprintOverlapPairs(trio, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 3L)))
  }

  test("repetitionRatios: unique text scores 0, looped text scores high") {
    val two = Seq(
      (1L, "every word here appears exactly once in this document"),
      (2L, "spam ham spam ham spam ham spam ham")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionRatios(two).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Double]("dup_2gram_frac"), x.getAs[Double]("dup_3gram_frac"))).toMap
    assert(r(1L) === ((9L, 0.0, 0.0)))
    // 8 words → 7 bigrams, 2 distinct ("spam ham","ham spam") → 5/7 repeated
    assert(math.abs(r(2L)._2 - 5.0 / 7) < 1e-9)
    // 6 trigrams, 2 distinct → 4/6 repeated
    assert(math.abs(r(2L)._3 - 4.0 / 6) < 1e-9)
  }

  test("qualityFilter: per-rule booleans and combined keep") {
    val two = Seq(
      (1L, "The cat and the dog walked to the park with great joy today."),
      (2L, "short")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFilter(two).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("enough_words"))
    assert(r(1L).getAs[Boolean]("terminal_punct"))
    assert(r(1L).getAs[Boolean]("has_stopword"))
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("enough_words"))
    assert(!r(2L).getAs[Boolean]("keep"))
  }

  test("bigramConditionals: P(w2|w1) sums to 1 per w1 before the count cut") {
    val corpus = Seq(
      (1L, "the cat"), (2L, "the dog"), (3L, "the cat")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramConditionals(corpus, minCount = 1).collect()
      .map(x => (x.getAs[String]("w1"), x.getAs[String]("w2")) ->
        (x.getAs[Long]("cnt"), x.getAs[Double]("cond_p"))).toMap
    assert(r(("the", "cat")) === ((2L, 2.0 / 3)))
    assert(r(("the", "dog")) === ((1L, 1.0 / 3)))
  }

  test("perplexityScores: split continuations cost exactly 1 bit per bigram") {
    val corpus = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val r = TextAnalysis.perplexityScores(corpus).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("bits_per_bigram"))).toMap
    // P(y|x) = P(z|x) = 0.5 → -log2 = 1.0 exactly
    assert(r(1L) === ((1L, 1.0)))
    assert(r(2L) === ((1L, 1.0)))
  }

  test("fingerprints: identical docs share all fingerprints, edits share most") {
    val trio = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence with other words entirely")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(trio).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) === fps(2L))
    assert((fps(1L) & fps(3L)).size < fps(1L).size / 2)
  }
}
