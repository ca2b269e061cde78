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

  /** Write df as a SINGLE parquet FILE at `dest` (the driver corpus layout:
    * `{sf}/{table}.parquet` is a file, and check_oracle.py globs files). */
  private def writeSingleFile(df: DataFrame, dest: String): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString
      .endsWith(".parquet")).findFirst().orElseThrow()
    Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    // clean the now-empty staging dir (best-effort)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/adv_sf")
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Files.createDirectories(Paths.get(outDir))
    val replaced = Set("documents", "events", "embeddings")
    graft.Tables.names.filterNot(replaced).foreach { t =>
      Files.copy(Paths.get(s"$baseDir/$t.parquet"),
        Paths.get(s"$outDir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    writeSingleFile(docs.toDF(), s"$outDir/documents.parquet")
    writeSingleFile(events.toDF(), s"$outDir/events.parquet")
    writeSingleFile(embeddings.toDF(), s"$outDir/embeddings.parquet")

    // print the shapes so a sweep log self-documents
    Seq("documents", "events", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$outDir/$t.parquet")
      println(s"ADV $t rows=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.stop()
  }
}
