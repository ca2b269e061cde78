package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication at pipeline scale: exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - signatures (minhash / simhash) are map-only column expressions — each
  *    doc's sketch is computed where the doc is read, no shuffle;
  *  - candidate generation shuffles only (band_key, doc_id) pairs — a few
  *    dozen bytes per doc per band, never the text;
  *  - degenerate LSH buckets (boilerplate shared by millions of docs) are
  *    capped by `maxBucket` before the pair join, which bounds the quadratic
  *    blowup and doubles as skew protection; the cap is logged in the result
  *    via the bucket size, not silently dropped;
  *  - exact-verify joins happen only on surviving candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups keyed by content hash (hash-groupBy: one
    * partial+final aggregate over (hash) — the text itself never shuffles
    * because md5 is computed map-side).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Keep exactly one row (lowest id) per distinct text — deterministic
    * alternative to dropDuplicates (which keeps an arbitrary row).
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  // -------------------------------------------------------------- minhash

  /** k-permutation MinHash signature over a shingle array: sig[s] =
    * min over shingles of xxhash64(shingle, s). Map-only.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingles, sh => xxhash64(sh, s))))

  /** doc_id + signature, docs with no shingles dropped. */
  def signatures(docs: DataFrame, k: Int = 64, shingleLen: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("shingles", Shingles.charShingles(col(textCol), shingleLen))
      .filter(size(col("shingles")) > 0)
      .select(col(idCol).as("doc_id"), minhashSignature(col("shingles"), k).as("sig"))

  /** LSH banding: one row per (doc, band) with the band's hash. Docs sharing
    * any (band_idx, band_hash) are candidates. b bands of r rows: collision
    * probability ≈ 1-(1-j^r)^b for Jaccard j.
    */
  def lshBands(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(
          b.as("band_idx"),
          xxhash64(slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), b)
            .as("band_hash")))).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_idx"), col("band.band_hash"))

  /** Candidate near-duplicate pairs with estimated Jaccard =
    * matching-signature fraction. `maxBucket` caps pathological buckets
    * before the self-join (skew guard).
    */
  def minhashCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16,
      shingleLen: Int = 5, maxBucket: Int = 100, minEstJaccard: Double = 0.0,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val rowsPerBand = k / bands
    val sigs = signatures(docs, k, shingleLen, textCol, idCol)
    val banded = lshBands(sigs, bands, rowsPerBand)
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_size") <= maxBucket)
    val a = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / lit(k.toDouble)).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  // -------------------------------------------------------------- simhash

  /** Classic 64-bit SimHash from a per-token hash array: bit i is set iff
    * the majority of token hashes have bit i set (the +1/-1 vote sum is
    * non-negative). `hashes` must be a materialized column reference — the
    * 64 per-bit filters each reference it, and a bare expression would be
    * duplicated 64× in the plan tree. Map-only.
    */
  def simhash64(hashes: Column): Column = {
    val n = size(hashes)
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      val setCount = size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L)))
      // bitwise pack (arithmetic *2 would sign-overflow on bit 63 under ANSI)
      acc.bitwiseOR(shiftleft(when(setCount * 2 >= n, lit(1L)).otherwise(lit(0L)), i))
    }
  }

  /** doc_id + 64-bit simhash fingerprint. */
  def simhashes(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("toks", Shingles.tokens(col(textCol)))
      .filter(size(col("toks")) > 0)
      .withColumn("tok_hashes", transform(col("toks"), t => xxhash64(t)))
      .select(col(idCol).as("doc_id"), simhash64(col("tok_hashes")).as("simhash"))

  /** Near-dup pairs by Hamming distance: 4×16-bit band index (a pair within
    * Hamming ≤ 3 must agree on ≥1 band — pigeonhole), exact bit_count verify
    * after the band join.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 200,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = simhashes(docs, textCol, idCol)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_idx"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*))
        .as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_idx"), col("band.band_val"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bucket_size") <= maxBucket)
    val a = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -------------------------------------------- n-gram Jaccard (exact)

  /** Exact Jaccard similarity on word n-gram sets, for pairs sharing at
    * least one n-gram. The inverted index is capped at `maxBucket` docs per
    * n-gram — frequent n-grams (stopword runs, boilerplate) carry no dedup
    * signal and would otherwise explode the pair count quadratically.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.1,
      maxBucket: Int = 200, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), Shingles.wordNgrams(col(textCol), n).as("grams"))
      .filter(size(col("grams")) > 0)
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("n_grams"))
    val inverted = grams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .withColumn("gram_freq", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("gram_freq") <= maxBucket)
    val shared = inverted.select(col("gram"), col("doc_id").as("doc_a"))
      .join(inverted.select(col("gram"), col("doc_id").as("doc_b")), Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
