package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts pinned by the round-10 adversarial-corpus sweep: NULL / empty /
  * degenerate inputs that the driver corpus never exercises but a corpus
  * regeneration plausibly could. Each test is the Spark half of a lockstep
  * engine+oracle decision recorded in the catalog SQL.
  */
class NullContractsSpec extends SparkSpec {
  import spark.implicits._

  test("textStats: empty text yields NULL ratios, not DIVIDE_BY_ZERO") {
    val docs = Seq((1L, "ab cd."), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.textStats(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_chars") === 6)
    assert(math.abs(out(0).getAs[Double]("punct_ratio") - 1.0 / 6) < 1e-15)
    // empty: n_chars = 0 -> char-denominated ratios are NULL (the DuckDB
    // double-division-by-zero value, so the oracle needs no guard)
    assert(out(1).getAs[Long]("n_chars") === 0)
    assert(out(1).isNullAt(out(1).fieldIndex("punct_ratio")))
    assert(out(1).isNullAt(out(1).fieldIndex("upper_ratio")))
    // the one-empty-token contract keeps avg_word_len defined (0/1)
    assert(out(1).getAs[Long]("n_words") === 1)
    assert(out(1).getAs[Double]("avg_word_len") === 0.0)
    // whitespace-only: trims to the same shape as empty
    assert(out(2).getAs[Long]("n_words") === 1)
  }

  test("textStats/qualityScore: NULL text propagates NULL, no crash") {
    val docs = Seq((1L, Option("real words here")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val stats = TextAnalysis.textStats(docs).orderBy("doc_id").collect()
    assert(stats(1).isNullAt(stats(1).fieldIndex("n_chars")))
    assert(stats(1).isNullAt(stats(1).fieldIndex("n_words")))
    val quality = TextAnalysis.qualityScore(docs).orderBy("doc_id").collect()
    // null text: every signal NULL; greatest/least skip NULLs identically
    // in Spark and DuckDB, so quality stays DEFINED (and equal) — the
    // value itself is pinned by the oracle gate, here we pin non-crash +
    // row preservation
    assert(quality.length === 2)
  }

  test("sessionize excludes events without an event time") {
    val events = Seq(
      (1L, Some(1000000L), 1L, 1.0),
      (2L, Some(2000000L), 1L, 2.0),
      (3L, Option.empty[Long], 1L, 99.0), // no ts -> no timeline position
      (4L, Option.empty[Long], 2L, 5.0)   // a user with ONLY null-ts events
    ).toDF("event_id", "ts_us", "user_id", "value")
    val sess = Sessions.sessionize(events, gapMicros = 10000000L).collect()
    assert(sess.length === 1) // one session for user 1; user 2 has none
    assert(sess.head.getAs[Long]("n_events") === 2)
    assert(math.abs(sess.head.getAs[Double]("total_value") - 3.0) < 1e-9)
  }

  test("IVF tolerates NULL vectors and a zero-norm centroid") {
    // vec_id 0 is the all-zero vector AND lands in the centroid init set;
    // vec_id 2 is a NULL vector. Before round 10: the NULL NPE'd train's
    // driver collect, and the zero centroid's NaN cosine (NaN sorts as
    // GREATEST) captured every vector into its cell.
    val rows = Seq(
      (0L, Some(Array(0f, 0f))),
      (1L, Some(Array(1f, 0f))),
      (2L, Option.empty[Array[Float]]),
      (3L, Some(Array(0f, 1f))),
      (4L, Some(Array(0.9f, 0.1f))),
      (5L, Some(Array(0.1f, 0.9f)))).toDF("vec_id", "embedding")
    val index = IVF.train(rows, c = 2, iters = 0) // centroids: zero vec + (1,0)
    val assigned = IVF.assign(rows, index).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!assigned.contains(2L)) // NULL vector excluded from the index
    // the degenerate centroid 0 never wins on real vectors...
    assert(assigned(1L) === 1 && assigned(4L) === 1)
    assert(assigned(3L) === 1 && assigned(5L) === 1) // best REAL centroid
    // ...and the zero vector itself falls to the lowest index by tie rule
    assert(assigned(0L) === 0)
    // top-k from a well-formed query ranks without the null/zero rows
    val top = IVF.topK(rows, index, query = Seq(1f, 0f), k = 10, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(top.head === 1L)
    assert(!top.contains(2L) && !top.contains(0L))
  }

  test("similarity ops exclude NULL vectors") {
    val rows = Seq(
      (1L, Some(Array(1f, 0f, 0f))),
      (2L, Some(Array(1f, 0f, 0f))),
      (3L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(rows, Seq(1f, 0f, 0f), k = 5).collect()
    assert(brute.map(_.getLong(0)).toSet === Set(1L, 2L))
    val pairs = Similarity.exactNearDupPairs(rows, threshold = 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("TopK.perGroup excludes null scores instead of an encoder assert") {
    val df = Seq(
      (Some(10.0), "a", 1L), (Some(20.0), "a", 2L),
      (Option.empty[Double], "a", 3L), // null score -> excluded
      (Option.empty[Double], "b", 4L)  // a group with ONLY null scores
    ).toDF("score", "g", "id")
    val top = TopK.perGroup(df, "g", "score", "id", k = 2).collect()
    assert(top.map(_.getAs[Long]("id")).toSet === Set(2L, 1L))
    assert(!top.exists(_.getAs[String]("g") == "b"))
  }

  test("DataQuality.orphans: a NULL foreign key is not an orphan") {
    import graft.etl.DataQuality
    val child = Seq(Some(1L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val bad = DataQuality.orphans(child, "fk", parent, "pk").collect()
    assert(bad.map(_.getAs[Long]("fk")).toSeq === Seq(99L))
    // opt-in restoration of the pre-r10 behavior (ADVICE r10): null FKs
    // flagged alongside true orphans
    val legacy = DataQuality.orphans(child, "fk", parent, "pk",
      nullsAsOrphans = true).collect()
    assert(legacy.map(r => Option(r.get(0))).toSet ===
      Set(Some(99L), None))
  }

  test("AsOf.join excludes null-time rows on both sides; null right VALUES still carry") {
    import graft.ops.AsOf
    val left = Seq(
      (1L, 10L, java.lang.Long.valueOf(100L)),
      (2L, 10L, null.asInstanceOf[java.lang.Long])) // null time: excluded
      .toDF("id", "k", "t")
    val right = Seq(
      (91L, 10L, java.lang.Long.valueOf(50L), java.lang.Double.valueOf(1.5)),
      (92L, 10L, java.lang.Long.valueOf(90L), null.asInstanceOf[java.lang.Double]), // null VALUE: most recent observation
      (93L, 10L, null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(9.9))) // null time: excluded
      .toDF("id", "k", "t", "v")
    val out = AsOf.join(left, right, "k", "t", "id", "v").collect()
    // the null-time left row is gone; the survivor sees the null-VALUE
    // observation at t=90 (not the stale 1.5, not the null-time 9.9)
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L))
    assert(out.head.isNullAt(out.head.fieldIndex("asof_v")))
  }

  test("pageRank excludes edges with a null endpoint") {
    val edges = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(3L)),
      (Some(1L), None), (None, Some(3L))).toDF("src", "dst")
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val withNulls = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Graph.pageRank(clean, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the null "node" must not enter the census (it would shift the base
    // rank b = scale/|V| and every rank value with it)
    assert(withNulls === expected)
  }

  test("regexp no-match extracts NULL under try_cast, both engines' contract") {
    val docs = Seq((1L, "src42"), (2L, "srcA"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "source")
    val out = docs.select(col("doc_id"),
      expr("try_cast(regexp_extract(source, 'src([0-9]+)', 1) AS LONG)").as("n"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n") === 42L)
    assert(out(1).isNullAt(1)) // '' from the no-match extract -> NULL, no throw
    assert(out(2).isNullAt(1))
  }
}
