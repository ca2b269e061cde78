package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDateTime

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Adversarial corpus generator (round-10 resilience item).
  *
  * Writes an SF-dir-shaped directory where `documents` / `events` /
  * `embeddings` carry shapes the driver's synthetic generator does NOT
  * produce today but a regeneration plausibly could:
  *
  *   - documents: non-ASCII text across scripts (CJK, RTL, Cyrillic,
  *     combining vs precomposed accents, astral-plane emoji + ZWJ
  *     sequences, Turkish dotless-i, German sharp-s), empty / whitespace /
  *     sub-shingle-length texts, embedded quotes/newlines/tabs, exact and
  *     near-duplicate groups in each script, null text/lang/source.
  *   - events: nulls in every nullable column (user_id, event_type, value,
  *     props, and ts itself), duplicate (user_id, ts) pairs, identical
  *     timestamps across users, window-boundary-exact timestamps, long
  *     session gaps, negative/zero values, props as `{}` / `{"k": n}` with
  *     non-ASCII sibling keys / NULL.
  *   - embeddings: the all-zero vector (norm 0), exact duplicate vectors,
  *     1-ulp near-twins, antipodal pairs, a null embedding row.
  *
  * All other tables are byte-copied from the base SF dir, so the FULL
  * 200-query catalog can be swept: queries not touching the adversarial
  * tables degenerate to the ordinary sf0.001 sweep, while every
  * documents/events/embeddings query sees the hostile shapes. Schemas
  * match the driver corpus exactly (TESTDATA.md / FIXTURES.md §4):
  * documents(doc_id i64, text str, lang str, source str, n_chars i64),
  * events(event_id i64, ts timestamp_ntz[us], user_id i64, event_type str,
  * value f64, props str), embeddings(vec_id i64, embedding list<float>,
  * label i32). `n_chars` is the CODE-POINT count (what both Spark `length`
  * and DuckDB `length` report), null when text is null.
  *
  * Usage: runMain graft.tools.AdversarialCorpus [outDir] [baseSfDir]
  * then:  runMain graft.Verify <outDir> /tmp/adv_verify
  *        python3 scripts/check_oracle.py <outDir> /tmp/adv_verify
  */
object AdversarialCorpus {

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: java.lang.Long)
  final case class Ev(event_id: Long, ts: LocalDateTime,
                      user_id: java.lang.Long, event_type: String,
                      value: java.lang.Double, props: String)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  private def cp(s: String): java.lang.Long =
    if (s == null) null else Long.box(s.codePointCount(0, s.length).toLong)

  def docs: Seq[Doc] = {
    val b = Seq.newBuilder[Doc]
    var id = 0L
    def add(text: String, lang: String = "en", source: String = "srcA"): Unit = {
      b += Doc(id, text, lang, source, cp(text)); id += 1
    }
    // exact-duplicate group, ASCII (3 copies) + one near-dup (one word off)
    val base = "the fast key order sort table scan merge part window small hash join"
    add(base); add(base); add(base)
    add("the fast key order sort table scan merge part window small hash agg")
    // near-dup pair differing only in ONE non-ASCII char
    add("spark group query café row data slow filter merge line", "fr", "srcB")
    add("spark group query cafè row data slow filter merge line", "fr", "srcB")
    // precomposed vs decomposed: U+00E9 vs 'e' + U+0301 — visually equal,
    // different code points; engines must stay byte-consistent, not normalize
    add("résumé café naïve façade", "fr", "srcB")
    add("résumé café naïve façade", "fr", "srcB")
    // CJK exact-dup pair + near-dup (one char changed); no spaces at all
    val zh = "数据库查询优化器对连接顺序进行重新排列以减少中间结果"
    add(zh, "zh", "srcC"); add(zh, "zh", "srcC")
    add(zh.updated(4, '优'), "zh", "srcC")
    // Japanese mixed scripts
    add("データ処理パイプラインは分散処理を行う", "ja", "srcC")
    // RTL Arabic + Hebrew
    add("محرك الاستعلامات يعالج البيانات الكبيرة", "ar", "srcD")
    add("מנוע השאילתות מעבד נתונים בקנה מידה גדול", "he", "srcD")
    // Cyrillic + Greek
    add("быстрый движок запросов обрабатывает данные", "ru", "srcD")
    add("γρήγορη μηχανή ερωτημάτων επεξεργάζεται δεδομένα", "el", "srcD")
    // astral-plane emoji (surrogate pairs) + ZWJ family sequence
    add("rocket 🚀 launch 😀 family 👨‍👩‍👧 done", "en", "srcE")
    add("rocket 🚀 launch 😀 family 👨‍👩‍👧 dont", "en", "srcE")
    // case-mapping traps: German sharp-s, Turkish dotted/dotless i
    add("straße STRASSE straße weiss", "de", "srcF")
    add("İstanbul için verı işleme sıralı", "tr", "srcF")
    // structural edges: empty, whitespace-only, sub-shingle lengths
    add("")
    add("   ")
    add("\t\n ")
    add("a")
    add("ab")
    add("é") // single two-byte char
    add("😀") // single astral char: 1 code point, 2 UTF-16 units, 4 UTF-8 bytes
    // embedded quotes / newlines / tabs / backslash (JSON + CSV escapers)
    add("she said \"hello\" then\nnew line\tand a tab \\ backslash 'quote'")
    // repeated single word (idf=0 / entropy edges), all-stopword doc
    add("data data data data data data data data data data")
    add("the a an of and or to in on at")
    // long doc: 2k code points of mixed-script repetition
    add(("mixed café 数据 🚀 " * 150).trim, "en", "srcG")
    // nulls: text, lang, source (doc_id stays non-null — engine contract)
    b += Doc(id, null, "en", "srcH", null); id += 1
    b += Doc(id, "plain text with null lang", null, "srcH", cp("plain text with null lang")); id += 1
    b += Doc(id, "plain text with null source", "en", null, cp("plain text with null source")); id += 1
    // filler: deterministic word-soup so sketch/stat queries see volume
    val words = Vector("spark", "query", "table", "merge", "window", "hash",
      "join", "scan", "sort", "filter", "group", "café", "数据",
      "stream", "batch", "row", "column", "value", "key", "order")
    val rnd = new Random(421L)
    (0 until 60).foreach { i =>
      val n = 20 + rnd.nextInt(60)
      val t = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
      add(t, Seq("en", "es", "de", "fr", "zh")(rnd.nextInt(5)), s"src${rnd.nextInt(6)}")
    }
    b.result()
  }

  def events: Seq[Ev] = {
    val b = Seq.newBuilder[Ev]
    var id = 0L
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def add(ts: LocalDateTime, user: java.lang.Long, typ: String,
            value: java.lang.Double, props: String): Unit = {
      b += Ev(id, ts, user, typ, value, props); id += 1
    }
    val types = Vector("view", "click", "purchase", "signup", "error")
    // regular activity for users 0..4 with deterministic jitter
    val rnd = new Random(422L)
    (0 until 150).foreach { i =>
      val u = i % 5
      val ts = t0.plusSeconds(i * 97L + rnd.nextInt(13))
      add(ts, Long.box(u.toLong), types(i % types.size),
        Double.box(math.rint(rnd.nextDouble() * 10000) / 100.0),
        s"""{"k": ${rnd.nextInt(100)}}""")
    }
    // null user_id rows (null groupBy/partition key)
    (0 until 8).foreach { i =>
      add(t0.plusSeconds(500L + i * 41L), null, types(i % types.size),
        Double.box(1.25 * i), s"""{"k": $i}""")
    }
    // null event_type, null value, null props, all-null-but-keys
    add(t0.plusMinutes(30), Long.box(1L), null, Double.box(5.0), """{"k": 1}""")
    add(t0.plusMinutes(31), Long.box(1L), "click", null, """{"k": 2}""")
    add(t0.plusMinutes(32), Long.box(2L), "view", Double.box(7.5), null)
    add(t0.plusMinutes(33), Long.box(2L), null, null, null)
    // null ts (no event time at all) — watermark/as-of/window edge
    add(null, Long.box(3L), "click", Double.box(9.0), """{"k": 3}""")
    add(null, null, null, null, null)
    // duplicate (user_id, ts) pair with different payloads
    val dup = t0.plusMinutes(45)
    add(dup, Long.box(4L), "view", Double.box(1.0), """{"k": 10}""")
    add(dup, Long.box(4L), "click", Double.box(2.0), """{"k": 11}""")
    // identical ts across users
    val shared = t0.plusMinutes(50)
    (0 until 5).foreach(u => add(shared, Long.box(u.toLong), "view",
      Double.box(3.0), """{"k": 50}"""))
    // window-boundary-exact timestamps (whole minutes / 5-minute marks)
    (0 until 6).foreach(i => add(t0.plusMinutes(60L + i * 5), Long.box(0L),
      "purchase", Double.box(10.0 + i), s"""{"k": ${60 + i}}"""))
    // long session gaps (sessionization splits) for user 5
    Seq(0L, 1L, 2L, 120L, 121L, 600L).foreach(m =>
      add(t0.plusMinutes(200L + m), Long.box(5L), "view", Double.box(1.0),
        """{"k": 5}"""))
    // props shape variants a regenerated generator could emit
    add(t0.plusMinutes(900), Long.box(6L), "view", Double.box(1.0), "{}")
    add(t0.plusMinutes(901), Long.box(6L), "view", Double.box(1.0),
      "{\"k\": 7, \"note\": \"café 数据\"}")
    add(t0.plusMinutes(902), Long.box(6L), "view", Double.box(1.0),
      """{"k": -3}""")
    // negative / zero values
    add(t0.plusMinutes(910), Long.box(7L), "error", Double.box(-12.5), """{"k": 8}""")
    add(t0.plusMinutes(911), Long.box(7L), "error", Double.box(0.0), """{"k": 9}""")
    b.result()
  }

  def embeddings: Seq[Emb] = {
    val b = Seq.newBuilder[Emb]
    var id = 0L
    val dim = 64
    def add(v: Array[Float], label: Int): Unit = { b += Emb(id, v, label); id += 1 }
    val rnd = new Random(423L)
    def rand(): Array[Float] = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // the all-zero vector: norm 0, cosine undefined — must not divide by zero
    add(Array.fill(dim)(0.0f), 0)
    // exact duplicate pair
    val d = rand(); add(d, 1); add(d.clone(), 1)
    // 1-ulp near-twin of the duplicate
    val nt = d.clone(); nt(0) = Math.nextUp(nt(0)); add(nt, 1)
    // antipodal pair (cosine exactly -1)
    val a = rand(); add(a, 2); add(a.map(-_), 2)
    // null embedding row
    b += Emb(id, null, 3); id += 1
    // tiny-magnitude vector (denormal-ish products)
    add(Array.fill(dim)(1e-30f), 4)
    // deterministic filler
    (0 until 72).foreach(i => add(rand(), i % 10))
    b.result()
  }

  /** Adversarial rows APPENDED to the base relational tables (round-10
    * second wave): the byte-copied TPC-H-ish tables never exercised the
    * ~140 relational queries with hostile shapes. Keys stay non-null and
    * mostly referentially sound (the TPC-H generator contract); the
    * appended rows add what a regeneration could plausibly emit — NULL
    * measures/dates/flags, empty and non-ASCII strings, orphan foreign
    * keys, duplicate business keys (dq_checks counts them identically on
    * both engines), boundary dates, and timestamps with a time-of-day
    * component (the base corpus is all-midnight).
    *
    * Construction: rows are built against the BASE file's exact schema
    * (createDataFrame + base.schema), so an i32 column stays i32 and the
    * union cannot silently widen a type.
    */
  private def appendRows(spark: SparkSession, baseFile: String,
      rows: Seq[Seq[Any]]): DataFrame = {
    val base = spark.read.parquet(baseFile)
    val crafted = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        rows.map(vs => org.apache.spark.sql.Row(vs: _*)): _*)),
      base.schema)
    base.unionByName(crafted)
  }

  private def ts(y: Int, m: Int, d: Int, h: Int = 0, mi: Int = 0, s: Int = 0) =
    LocalDateTime.of(y, m, d, h, mi, s)

  /** Key offsets derived from the BASE tables' max keys, so appended ids
    * never collide with real ids at any base SF (at sf0.01 the old fixed
    * 200/2000-style ids collided with live custkeys/orderkeys, minting
    * accidental duplicate PKs that crashed the correlated scalar subquery
    * and skewed join fanout). At sf0.001 the derived values reproduce the
    * original fixture ids exactly (1499+501=2000, 149+51=200, ...).
    */
  final case class Keys(ko: Long, kc: Long, kp: Long, ks: Long, kn: Int, kr: Int) {
    def orphanCust: Long = kc + 1000     // beyond base AND appended range
    def orphanOrder: Long = ko + 500
    def orphanPart: Long = kp + 999
    def orphanNation: Int = kn + 50
    def orphanRegion: Int = kr + 4
  }

  def ordersExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(k.ko + 0, 5L, "O", null, ts(1997, 3, 5), "1-URGENT"),         // null price
    Seq(k.ko + 1, 7L, null, 0.0, ts(1998, 6, 1), null),               // null status+priority
    Seq(k.ko + 2, k.orphanCust, "F", 123.45, ts(1996, 2, 29), "5-LOW"), // orphan cust, leap day
    Seq(k.ko + 3, null, "O", 10.0, ts(1997, 7, 4), "3-MEDIUM"),       // null custkey
    Seq(k.ko + 4, 3L, "", -50.0, ts(1999, 9, 9), ""),                 // empty flags, negative
    Seq(k.ko + 5, 11L, "O", 42.0, null, "2-HIGH"),                    // NULL date
    Seq(k.ko + 6, 11L, "O", 43.0, ts(1995, 1, 1), "2-HIGH"),          // min boundary
    Seq(k.ko + 7, 2L, "P", 44.0, ts(2001, 8, 1), "4-NOT SPECIFIED"),  // max boundary
    Seq(k.ko + 8, 2L, "O", 999999.99, ts(2000, 12, 31), "5-LOW"),
    Seq(k.ko + 9, 0L, "O", 55.55, ts(2000, 2, 29, 12, 34, 56), "1-URGENT"), // time-of-day
    Seq(k.ko + 10, 4L, "O", 60.0, ts(1997, 1, 15), "3-MEDIUM"),       // duplicate pk pair
    Seq(k.ko + 10, 4L, "F", 61.0, ts(1997, 1, 16), "3-MEDIUM"),
    Seq(k.ko + 12, 8L, "X", 66.6, ts(1998, 4, 1), "1-DRINGEND-É"),    // unseen codes
    Seq(k.ko + 14, k.kc + 8, "O", 70.0, ts(1999, 2, 1), "5-LOW"),     // -> null-name nation
    Seq(k.ko + 15, k.kc + 9, "F", 71.0, ts(1999, 2, 2), "5-LOW"),     // -> unicode nation
    Seq(k.ko + 16, k.kc + 10, "O", 72.0, ts(1999, 2, 3), "5-LOW"))    // -> null-name region

  def customerExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(k.kc + 0, "Müller Çelik", Int.box(3), 100.0, "MACHINERY"),
    Seq(k.kc + 1, "东方 客户", Int.box(7), null, "BUILDING"),          // null acctbal
    Seq(k.kc + 2, "😀 customer", Int.box(12), -1000.0, null),         // null segment
    Seq(k.kc + 3, "", Int.box(0), 0.0, ""),                           // empty strings
    Seq(k.kc + 4, null, Int.box(5), 55.5, "FURNITURE"),               // null name
    Seq(k.kc + 5, "O'Brien \"quoted\", comma", Int.box(9), 10.0, "HOUSEHOLD"),
    Seq(k.kc + 6, "İpek Ünal", Int.box(k.orphanNation), 20.0, "AUTOMOBILE"), // orphan nation
    Seq(k.kc + 7, "plain person", null, 30.0, "machinery"),           // null nation, case-variant seg
    // customers wired to the adversarial NATIONS below, so null / non-ASCII
    // / empty dim attributes actually flow through the join queries
    // (an unreferenced dim row changes nothing)
    Seq(k.kc + 8, "via null-name nation", Int.box(k.kn + 1), 40.0, "MACHINERY"),
    Seq(k.kc + 9, "via unicode nation", Int.box(k.kn + 0), 41.0, "BUILDING"),
    Seq(k.kc + 10, "via null-name region", Int.box(k.kn + 5), 42.0, "FURNITURE"))

  def lineitemExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(10L, 5L, 2L, Int.box(9), null, 100.0, 0.05, 0.02, "N", "O", ts(1997, 5, 5)), // null qty
    Seq(10L, 6L, 3L, Int.box(10), 0.0, null, null, null, "A", "F", ts(1997, 5, 6)),  // null money
    Seq(11L, null, 2L, Int.box(9), 3.0, 30.0, 0.1, 0.0, "R", "O", ts(1998, 1, 1)),   // null partkey
    Seq(11L, 7L, null, Int.box(10), 4.0, 40.0, 1.0, 0.0, "N", "F", ts(1998, 1, 2)),  // 100% discount
    Seq(12L, k.orphanPart, 2L, Int.box(9), -5.0, -50.0, 0.0, 0.0, "R", "F", ts(1998, 2, 2)), // orphan part, negatives
    Seq(12L, 8L, 4L, Int.box(10), 6.0, 60.0, 0.0, 0.08, null, null, ts(1998, 3, 3)), // null flags
    Seq(13L, 9L, 5L, Int.box(9), 7.0, 70.0, 0.02, 0.01, "", "", null),               // null shipdate
    Seq(13L, 10L, 6L, Int.box(10), 8.0, 80.0, 0.03, 0.01, "A", "O", ts(1995, 1, 2)), // min boundary
    Seq(k.orphanOrder, 11L, 7L, Int.box(1), 9.0, 90.0, 0.04, 0.01, "N", "O", ts(2001, 11, 4)), // orphan order, max date
    Seq(k.ko + 0, 12L, 8L, Int.box(1), 10.0, 95.0, 0.05, 0.02, "R", "O", ts(1999, 6, 30, 23, 59, 59)))

  def partExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(k.kp + 0, "πart 零件", "Brand#13", "ECONOMY", Int.box(0), 0.0),
    Seq(k.kp + 1, null, null, null, null, null),                      // all-null attrs
    Seq(k.kp + 2, "", "Brand#5", "", Int.box(-1), -9.99),
    Seq(k.kp + 3, "emoji 🚀 bolt", "Brand#19", "PROMO", Int.box(50), 123.45))

  def nationExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(Int.box(k.kn + 0), "Deutschland Öst", Int.box(1)),            // non-ASCII name
    Seq(Int.box(k.kn + 1), null, Int.box(2)),                         // null name
    Seq(Int.box(k.kn + 2), "", Int.box(0)),                           // empty name
    Seq(Int.box(k.kn + 3), "keyless nation", null),                   // null region FK
    Seq(Int.box(k.kn + 4), "orphan nation", Int.box(k.orphanRegion)), // orphan region FK
    Seq(Int.box(k.kn + 5), "in nameless region", Int.box(k.kr + 0)))  // -> null-name region

  def regionExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(Int.box(k.kr + 0), null),                                     // null name
    Seq(Int.box(k.kr + 1), ""))                                       // empty name

  def supplierExtra(k: Keys): Seq[Seq[Any]] = Seq(
    Seq(k.ks + 0, "Ünal 供应商", Int.box(3), null),
    Seq(k.ks + 1, null, null, -5.0),
    Seq(k.ks + 2, "", Int.box(k.orphanNation), 0.0))

  /** Seeded random fuzz wave (round-11 verdict item 3): the curated rows
    * above encode every hostile shape someone THOUGHT of; this draws
    * doc/event/embedding/relational shapes from seeded generators —
    * lengths, scripts, null masks, key collisions, boundary dates — so a
    * sweep over N seeds covers the shapes nobody enumerated. Deterministic
    * per seed (same seed → byte-identical corpus), so a failing seed is a
    * permanent regression fixture: re-run
    * `scripts/fuzz_sweep.sh <seed>` to reproduce.
    *
    * Deliberately WITHIN the driver generator's value contracts, so any
    * red query is an engine/oracle divergence, not fixture noise:
    * money/value columns stay on the 2-dp grain (a >2-dp price makes the
    * catalog's lossless-decimal casts tie-round differently per engine —
    * ROUNDLOG lesson 5), floats avoid NaN/Inf (no catalog column carries
    * them today), embeddings keep dim 64, ids/PKs stay non-null, and the
    * text pools avoid uppercase Greek (Spark lower() applies the
    * CONTEXT-DEPENDENT final-sigma rule 'Σ'→'ς', DuckDB the simple map
    * 'Σ'→'σ' — the İ-expansion trick cannot replay a contextual mapping
    * in SQL, so that class is excluded rather than half-tested).
    */
  /** `skew = true` adds the hot-key axis (round-11 verdict item 4): one
    * key owns ~50% of every fuzz table's rows — the shape that dominates
    * real 100 TB corpora (one power user, one viral document, one
    * mega-customer) and that uniform draws can never produce. Hot rows are
    * the EVEN indices (a deterministic post-transform, no extra rnd draws),
    * so a (seed, skew) pair is as reproducible as a bare seed and the
    * non-skew stream for the same seed is unchanged. Targets: events'
    * hot user (sessionize's one giant ts-sorted timeline, the stream
    * aggregates' hot state key), lineitem's hot suppkey/orderkey
    * (salted_join_agg's exact salting scenario, order-join fan-out),
    * orders' hot custkey (tpch_q13-class fan-out), documents' single
    * viral text (the minhash/simhash maxBucket cap — both engines replay
    * the cap, `HAVING COUNT(*) BETWEEN 2 AND 100` in the oracle, so a
    * giant band bucket is a parity test of the cap itself, not noise).
    */
  final class Fuzz(seed: Long, skew: Boolean = false) {
    private val rnd = new Random(seed)
    private def hot(i: Int): Boolean = skew && i % 2 == 0
    // ~8 normalized tokens so 5-gram shingles and simhash tokens exist;
    // identical for every hot doc — ONE exact-dup group of ~half the wave
    private val hotText =
      "viral doc replica shard stream token merge spark"

    private def mask[T >: Null <: AnyRef](p: Double, v: => T): T =
      if (rnd.nextDouble() < p) null else v
    private def money(lo: Double, hi: Double): Double =
      math.rint((lo + rnd.nextDouble() * (hi - lo)) * 100) / 100.0
    private def pick[T](xs: scala.collection.IndexedSeq[T]): T = xs(rnd.nextInt(xs.size))

    private val pools: Vector[Vector[String]] = Vector(
      Vector("spark", "query", "table", "merge", "window", "hash", "join",
        "scan", "sort", "filter", "group", "row", "key", "order", "data"),
      Vector("café", "résumé", "naïve", "façade", "über", "straße",
        "garçon", "niño", "çelik"),
      Vector("数据", "查询", "优化", "连接", "排序", "分布式", "处理", "引擎"),
      Vector("بيانات", "استعلام", "محرك", "معالجة"),
      Vector("данные", "запрос", "движок", "обработка"),
      Vector("δεδομένα", "μηχανή", "ερώτημα"),
      // grapheme-cluster pool (round-12 wave extends it): emoji, a ZWJ
      // family, double-combining "é́", plus NFD "café" (decomposed twin of
      // pool 1's NFC — neither engine normalizes, so byte-compare must
      // hold), astral-plane musical symbols (surrogate pairs: a char-level
      // uppercase/reverse would corrupt them), a triple-stacked combining
      // run, a flag+VS16+ZWJ sequence, and a skin-tone-modified emoji.
      // All code-point-safe: a divergence means one engine went
      // grapheme-aware (or byte-level) on a function the oracle replays
      // as code points — exactly the class this pool hunts.
      Vector("🚀", "😀", "👨‍👩‍👧", "🎉", "🧪", "é́",
        "cafe\u0301",               // NFD cafe (e + combining acute)
        "\ud834\udd1e\ud834\udd22\u97f3", // astral musical symbols + CJK
        "a\u0300\u0316\u0301z",       // triple-stacked combining run
        "\ud83c\udff3\ufe0f\u200d\ud83c\udf08", // flag+VS16+ZWJ+rainbow
        "\ud83d\udc4d\ud83c\udffd"), // thumbs-up + skin-tone modifier
      Vector("\"q\"", "line\nbreak", "tab\tsep", "back\\slash", "'sq'"))

    private def fuzzText(): String = {
      val shape = rnd.nextInt(12)
      if (shape == 0) ""                               // empty
      else if (shape == 1) pick(Vector(" ", "  \t", "\n")) // whitespace-only
      else if (shape == 2) {                           // sub-shingle soup
        val pool = pick(pools)
        pick(pool).take(1 + rnd.nextInt(3))
      } else if (shape == 3) {                         // CJK, no spaces
        Seq.fill(3 + rnd.nextInt(40))(pick(pools(2))).mkString
      } else if (shape == 4) {                         // degenerate long doc:
        // ONE token repeated — minimal entropy, maximal repetition ratio,
        // every shingle identical (gram kernels, minhash banding,
        // bigram-LM/perplexity smoothing all hit their floor cases)
        val w = pick(pick(pools.take(7)))
        Seq.fill(300 + rnd.nextInt(1200))(w).mkString(" ")
      } else if (shape == 5) {                         // long mixed doc
        // ~1-8k chars: an order of magnitude beyond every other fuzz doc —
        // length-normalized scores (BM25, quality ratios), gram counts,
        // and token packing see a genuinely long document
        val ps = Seq.fill(2)(pick(pools))
        Seq.fill(200 + rnd.nextInt(1200))(pick(pick(ps.toIndexedSeq))).mkString(" ")
      } else {                                         // 1-3 mixed pools
        val ps = Seq.fill(1 + rnd.nextInt(3))(pick(pools))
        val n = 1 + rnd.nextInt(60)
        Seq.fill(n)(pick(pick(ps.toIndexedSeq))).mkString(" ")
      }
    }

    def docs(n: Int, firstId: Long): Seq[Doc] = {
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      // null RUNS, not just isolated nulls: consecutive null texts in id
      // order are what produce all-null frames/partitions downstream —
      // the shape class that caught the rolling_median empty-frame crash
      var nullRun = 0
      (0 until n).map { i =>
        val roll = rnd.nextDouble()
        if (nullRun == 0 && roll < 0.015) nullRun = 3 + rnd.nextInt(10)
        val text =
          if (nullRun > 0) { nullRun -= 1; null }
          else if (roll < 0.03) null
          else if (roll < 0.13 && texts.nonEmpty) pick(texts) // exact dup
          else if (roll < 0.20 && texts.exists(_.length > 3)) { // near-dup
            val t = pick(texts.filter(_.length > 3))
            val at = rnd.nextInt(t.length)
            // splice at a char that is not a low/high surrogate half
            if (Character.isSurrogate(t.charAt(at))) t
            else t.updated(at, if (t.charAt(at) == 'x') 'y' else 'x')
          } else fuzzText()
        if (text != null) texts += text
        // hot-key axis: even indices collapse onto the one viral text
        // (after the draw machinery, so the rnd stream — and with it the
        // odd-index rows — matches the non-skew corpus for this seed)
        val outText = if (hot(i)) hotText else text
        Doc(firstId + i, outText,
          mask(0.05, pick(Vector("en", "fr", "zh", "de", "es", "xx"))),
          mask(0.05, s"src${rnd.nextInt(8)}"), cp(outText))
      }
    }

    def events(n: Int, firstId: Long): Seq[Ev] = {
      val t0 = LocalDateTime.of(2024, 2, 1, 0, 0, 0)
      val types = Vector("view", "click", "purchase", "signup", "error", "fuzz")
      val seen = scala.collection.mutable.ArrayBuffer.empty[(java.lang.Long, LocalDateTime)]
      // runs of null VALUES: to fill a whole ORDERED window frame the run
      // must be consecutive within one user's ts-sorted timeline, so a
      // run pins ONE user and emits back-to-back timestamps (independent
      // user/ts draws would scatter the nulls across every frame — review
      // r11 caught the first version doing exactly that)
      var nullValRun = 0
      var runUser: java.lang.Long = null
      var runTs: LocalDateTime = t0
      (0 until n).map { i =>
        if (nullValRun == 0 && rnd.nextDouble() < 0.015) {
          nullValRun = 4 + rnd.nextInt(12)
          runUser = Long.box(rnd.nextInt(10).toLong)
          runTs = t0.plusSeconds(rnd.nextInt(259200).toLong)
        }
        val inRun = nullValRun > 0
        val user: java.lang.Long =
          if (inRun) runUser
          else mask(0.05, Long.box(rnd.nextInt(10).toLong))
        val ts0: LocalDateTime =
          if (inRun) { runTs = runTs.plusSeconds(7 + rnd.nextInt(50).toLong); runTs }
          else if (rnd.nextDouble() < 0.04) null
          else if (rnd.nextDouble() < 0.03)                 // PRE-EPOCH event time:
            // negative unix_micros is where truncating division (Spark
            // `div`, toward zero) and floor division (DuckDB `//`,
            // date_trunc) part ways — every ts_us-bucketing site must use
            // exact floor division or its pre-1970 buckets shift by one
            LocalDateTime.of(1969, 12, 31, 23, 59, 59)
              .minusSeconds(rnd.nextInt(259200).toLong)
          else if (rnd.nextDouble() < 0.015)                // far-future (2224)
            t0.plusYears(200).plusSeconds(rnd.nextInt(259200).toLong)
          else if (rnd.nextDouble() < 0.06 && seen.nonEmpty) pick(seen)._2 // shared ts
          else if (rnd.nextDouble() < 0.10)                 // window-boundary exact
            t0.plusMinutes(rnd.nextInt(4320).toLong)
          else t0.plusSeconds(rnd.nextInt(259200).toLong)
        // duplicate (user, ts) pair with a different payload
        val (u0, ts) = if (!inRun && rnd.nextDouble() < 0.05 && seen.nonEmpty) pick(seen)
          else (user, ts0)
        // hot-key axis: one user owns every even-indexed event — sessionize
        // gets one giant ts-sorted timeline, streaming aggregates one hot
        // state key (override after the draws: odd rows match non-skew)
        val u: java.lang.Long = if (hot(i)) Long.box(7L) else u0
        // record the DRAWN user, not the skew override: `seen` feeds the
        // duplicate-pair and shared-ts draws on later (odd, non-hot) rows,
        // so recording 7L would make odd rows diverge from the non-skew
        // corpus for the same seed and break the invariant above
        if (ts != null && u0 != null) seen += ((u0, ts))
        val value: java.lang.Double =
          if (inRun) { nullValRun -= 1; null }
          // explicit 0.0, never `negative * 0` — that mints -0.0, whose
          // cross-engine repr in a hash compare is noise, not signal
          else mask(0.05, Double.box(
            if (rnd.nextDouble() < 0.05) 0.0 else money(-100, 10000)))
        Ev(firstId + i, ts, u, mask(0.04, pick(types)), value,
          mask(0.05, pick(Vector("{}", s"""{"k": ${rnd.nextInt(100) - 20}}""",
            s"""{"k": ${rnd.nextInt(9)}, "note": "café 数据"}"""))))
      }
    }

    def embeddings(n: Int, firstId: Long): Seq[Emb] = {
      val dim = 64
      val prev = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      (0 until n).map { i =>
        val roll = rnd.nextDouble()
        val v: Array[Float] =
          if (roll < 0.04) null
          else if (roll < 0.08) Array.fill(dim)(0.0f)
          else if (roll < 0.16 && prev.nonEmpty) pick(prev).clone()
          else if (roll < 0.22 && prev.nonEmpty) {       // 1-ulp twin
            val t = pick(prev).clone(); val j = rnd.nextInt(dim)
            t(j) = Math.nextUp(t(j)); t
          } else {
            val scale = math.pow(10, rnd.nextInt(7) - 3)  // 1e-3 .. 1e3
            Array.fill(dim)(((rnd.nextDouble() * 2 - 1) * scale).toFloat)
          }
        if (v != null) prev += v
        Emb(firstId + i, v, rnd.nextInt(10))
      }
    }

    /** Random relational rows appended ABOVE the curated block's id range
      * (the curated rows use k.kX + 0..16; fuzz starts at +100). Shapes:
      * null masks on every nullable attr, orphan FKs (p=.06), duplicate
      * PKs (p=.05), boundary dates and time-of-day timestamps, empty and
      * multi-script strings, 2-dp money, negative/zero magnitudes.
      */
    def ordersExtra(k: Keys, n: Int): Seq[Seq[Any]] = {
      val status = Vector("O", "F", "P", "", "Z")
      val prio = Vector("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", "")
      (0 until n).map { i =>
        val key = if (rnd.nextDouble() < 0.05 && i > 0) k.ko + 100 + rnd.nextInt(i)
          else k.ko + 100 + i
        val cust: Any = if (rnd.nextDouble() < 0.04) null
          else if (rnd.nextDouble() < 0.06) k.orphanCust
          else Long.box(rnd.nextInt(15).toLong)
        // a customer whose ONLY order is null-priced: SUM(price) per
        // custkey is NULL for a whole group — the shape that separates
        // "excludes null values" rank machinery from an unfiltered
        // COUNT(*) (gini/lorenz audit, round 11). The unique custkey
        // guarantees no other order repairs the group's sum.
        if (rnd.nextDouble() < 0.03)
          Seq(key, Long.box(900000L + i), mask(0.04, pick(status)),
            null, mask(0.05, randDate()), mask(0.04, pick(prio)))
        else
          // hot-key axis: one customer owns half the wave's orders
          // (tpch_q13-class fan-out); the null-priced-unique-customer
          // branch above keeps its contract (it NEEDS a fresh custkey)
          Seq(key, if (hot(i)) Long.box(4L) else cust,
            mask(0.04, pick(status)),
            mask(0.05, Double.box(money(-500, 500000))),
            mask(0.05, randDate()), mask(0.04, pick(prio)))
      }
    }

    /** Calendar boundary dates: leap days (clamping in add_months /
      * last_day), month-ends (the add_months Jan-31 → Feb-28 clamp), year
      * boundaries, the epoch edge (datediff day keys go NEGATIVE pre-1970
      * — RANGE frames and day arithmetic must hold on negative integers),
      * and far past/future (both engines are proleptic Gregorian; any
      * hybrid-calendar shortcut would diverge here).
      */
    private val boundaryDates = Vector(
      LocalDateTime.of(1969, 12, 31, 0, 0, 0), // pre-epoch: negative day key
      LocalDateTime.of(1970, 1, 1, 0, 0, 0),   // epoch itself
      LocalDateTime.of(1996, 2, 29, 0, 0, 0),  // leap day
      LocalDateTime.of(2000, 2, 29, 0, 0, 0),  // century leap day
      LocalDateTime.of(1995, 1, 31, 0, 0, 0),  // month-end (add_months clamp)
      LocalDateTime.of(1998, 12, 31, 0, 0, 0), // year boundary
      LocalDateTime.of(1900, 1, 1, 0, 0, 0),   // far past, proleptic range
      LocalDateTime.of(2100, 12, 31, 0, 0, 0)) // far future (2100 is NOT leap)

    private def randDate(): LocalDateTime = {
      if (rnd.nextDouble() < 0.15) pick(boundaryDates)
      else {
        val d = LocalDateTime.of(1995, 1, 1, 0, 0, 0)
          .plusDays(rnd.nextInt(2500).toLong)
        if (rnd.nextDouble() < 0.2)
          d.plusSeconds(rnd.nextInt(86400).toLong) // time-of-day component
        else d
      }
    }

    private def fuzzName(): String = {
      val shape = rnd.nextInt(6)
      if (shape == 0) ""
      else Seq.fill(1 + rnd.nextInt(3))(pick(pick(pools.take(7)))).mkString(" ")
    }

    def customerExtra(k: Keys, n: Int): Seq[Seq[Any]] = {
      val seg = Vector("MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "AUTOMOBILE", "machinery", "")
      (0 until n).map { i =>
        val nat: Any = if (rnd.nextDouble() < 0.05) null
          else if (rnd.nextDouble() < 0.06) Int.box(k.orphanNation)
          else Int.box(rnd.nextInt(25))
        Seq(k.kc + 100 + i, mask(0.05, fuzzName()), nat,
          mask(0.05, Double.box(money(-2000, 10000))), mask(0.05, pick(seg)))
      }
    }

    def lineitemExtra(k: Keys, n: Int): Seq[Seq[Any]] = {
      (0 until n).map { i =>
        val okey0: Any = if (rnd.nextDouble() < 0.06) k.orphanOrder
          else Long.box(rnd.nextInt(20).toLong)
        val pkey: Any = if (rnd.nextDouble() < 0.04) null
          else if (rnd.nextDouble() < 0.06) k.orphanPart
          else Long.box(rnd.nextInt(60).toLong)
        val skey0: Any = mask(0.04, Long.box(rnd.nextInt(10).toLong))
        // hot-key axis: half the wave's lineitems hit ONE supplier (the
        // salted_join_agg scenario: big-side join-key skew) and ONE order
        val okey: Any = if (hot(i)) Long.box(5L) else okey0
        val skey: Any = if (hot(i)) Long.box(3L) else skey0
        Seq(okey, pkey, skey, Int.box(1 + rnd.nextInt(7)),
          mask(0.04, Double.box((rnd.nextInt(101) - 10).toDouble)),
          mask(0.04, Double.box(money(-100, 100000))),
          mask(0.04, Double.box(rnd.nextInt(101) / 100.0)),
          mask(0.04, Double.box(rnd.nextInt(9) / 100.0)),
          mask(0.04, pick(Vector("N", "A", "R", ""))),
          mask(0.04, pick(Vector("O", "F", ""))),
          mask(0.05, randDate()))
      }
    }

    def partExtra(k: Keys, n: Int): Seq[Seq[Any]] = {
      (0 until n).map { i =>
        Seq(k.kp + 100 + i, mask(0.06, fuzzName()),
          mask(0.05, s"Brand#${rnd.nextInt(60)}"),
          mask(0.05, pick(Vector("ECONOMY", "PROMO", "STANDARD", "小型", ""))),
          mask(0.05, Int.box(rnd.nextInt(60) - 5)),
          mask(0.05, Double.box(money(-10, 2000))))
      }
    }

    def supplierExtra(k: Keys, n: Int): Seq[Seq[Any]] = {
      (0 until n).map { i =>
        val nat: Any = if (rnd.nextDouble() < 0.05) null
          else if (rnd.nextDouble() < 0.06) Int.box(k.orphanNation)
          else Int.box(rnd.nextInt(25))
        Seq(k.ks + 100 + i, mask(0.06, fuzzName()), nat,
          mask(0.06, Double.box(money(-1000, 9000))))
      }
    }
  }

  /** Write df as a SINGLE parquet FILE at `dest` (the driver corpus layout:
    * `{sf}/{table}.parquet` is a file, and check_oracle.py globs files). */
  private def writeSingleFile(df: DataFrame, dest: String): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    // NIO streams hold an open directory handle until closed — one leaked
    // fd per table written, and on some platforms the open handle makes
    // the delete walk below fail (ADVICE r10)
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow())
    Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    // clean the now-empty staging dir (best-effort)
    scala.util.Using.resource(Files.walk(Paths.get(tmp)))(
      _.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p)))
  }

  def main(args: Array[String]): Unit = {
    val positional = args.takeWhile(!_.startsWith("--"))
    val outDir = positional.headOption.getOrElse("/tmp/adv_sf")
    val baseDir = if (positional.length > 1) positional(1) else "/root/testdata/sf0.001"
    // --fuzz <seed>: ADD the seeded random wave on top of the curated rows
    // (scripts/fuzz_sweep.sh loops seeds; a failing seed reproduces exactly)
    // --skew: hot-key axis — one key owns ~50% of each fuzz wave (Fuzz
    // scaladoc; FUZZ_SKEW=1 in fuzz_sweep.sh)
    val fuzz: Option[Fuzz] = {
      val ix = args.indexOf("--fuzz")
      if (ix >= 0 && ix + 1 < args.length)
        Some(new Fuzz(args(ix + 1).toLong, skew = args.contains("--skew")))
      else None
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Files.createDirectories(Paths.get(outDir))
    def maxKey(t: String, c: String): Long =
      spark.read.parquet(s"$baseDir/$t.parquet")
        .agg(org.apache.spark.sql.functions.max(c)).head()
        .get(0).asInstanceOf[Number].longValue
    val k = Keys(
      ko = maxKey("orders", "o_orderkey") + 501,
      kc = maxKey("customer", "c_custkey") + 51,
      kp = maxKey("part", "p_partkey") + 101,
      ks = maxKey("supplier", "s_suppkey") + 11,
      kn = (maxKey("nation", "n_nationkey") + 6).toInt,
      kr = (maxKey("region", "r_regionkey") + 1).toInt)
    def withFuzz(cur: Seq[Seq[Any]], f: Fuzz => Seq[Seq[Any]]): Seq[Seq[Any]] =
      cur ++ fuzz.map(f).getOrElse(Seq.empty)
    val appended = Map(
      "orders" -> withFuzz(ordersExtra(k), _.ordersExtra(k, 30)),
      "customer" -> withFuzz(customerExtra(k), _.customerExtra(k, 25)),
      "lineitem" -> withFuzz(lineitemExtra(k), _.lineitemExtra(k, 40)),
      "part" -> withFuzz(partExtra(k), _.partExtra(k, 15)),
      "supplier" -> withFuzz(supplierExtra(k), _.supplierExtra(k, 12)),
      "nation" -> nationExtra(k),
      "region" -> regionExtra(k))
    val replaced = Set("documents", "events", "embeddings")
    graft.Tables.names.filterNot(t => replaced(t) || appended.contains(t)).foreach { t =>
      Files.copy(Paths.get(s"$baseDir/$t.parquet"),
        Paths.get(s"$outDir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    } // (every table is now replaced or appended; the copy loop stays for safety)
    appended.foreach { case (t, extra) =>
      writeSingleFile(appendRows(spark, s"$baseDir/$t.parquet", extra),
        s"$outDir/$t.parquet")
    }
    // fuzz ids start well above the curated block (ids only need to be
    // unique WITHIN these tables — they replace, not append)
    val allDocs = docs ++ fuzz.map(_.docs(200, 1000L)).getOrElse(Seq.empty)
    val allEvents = events ++ fuzz.map(_.events(300, 1000L)).getOrElse(Seq.empty)
    val allEmbs = embeddings ++ fuzz.map(_.embeddings(100, 1000L)).getOrElse(Seq.empty)
    writeSingleFile(allDocs.toDF(), s"$outDir/documents.parquet")
    writeSingleFile(allEvents.toDF(), s"$outDir/events.parquet")
    writeSingleFile(allEmbs.toDF(), s"$outDir/embeddings.parquet")

    // print the shapes so a sweep log self-documents
    (Seq("documents", "events", "embeddings") ++ appended.keys.toSeq.sorted).foreach { t =>
      val df = spark.read.parquet(s"$outDir/$t.parquet")
      println(s"ADV $t rows=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.stop()
  }
}
