package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single map-only scoring pass (the
  * codegen'd [[graft.functions.CosineSimilarity]] kernel) followed by a
  * TakeOrderedAndProject, so the cluster-wide cost is one read of the
  * embedding table and a k-row-per-partition heap merge; no shuffle of the
  * vectors themselves.
  *
  * Scale path: random-hyperplane LSH. Each vector gets `tables` bucket ids
  * (signs of `bitsPerTable` fixed random projections); a query probes only
  * its own buckets, reducing scored candidates by ~(1 - (1-p^b)^L). The
  * hyperplanes are generated from a fixed seed so bucketing is deterministic
  * and reproducible across runs and clusters. At 100 TB the bucketed table
  * would be written out partitioned by (table_idx, bucket) so probes prune
  * parquet partitions instead of scanning.
  */
object Similarity {

  /** Deterministic unit-less random hyperplanes: tables × bitsPerTable
    * planes, each of dimension `dim`, from a seeded Gaussian.
    */
  def hyperplanes(dim: Int, tables: Int, bitsPerTable: Int, seed: Long = 42L): Seq[Seq[Seq[Float]]] = {
    val rng = new Random(seed)
    Seq.fill(tables)(Seq.fill(bitsPerTable)(Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  /** Hash-derived Rademacher (±1) hyperplanes: sign(t, b, i) = low bit of
    * the 60-bit hex prefix of md5("plane:t:b:i"). Sign-projection LSH only
    * consumes the projection's sign, and random-±1 planes are a standard
    * sign-LSH family (Achlioptas-style sparse projections), so bucket
    * quality matches the seeded Gaussians — with one property they lack:
    * any engine with md5() can recompute the planes EXACTLY, so bucket
    * assignment (and therefore the candidate set) is replayable in plain
    * SQL. The correctness gate exploits that: the DuckDB oracle rebuilds
    * the same buckets and pins the LSH output at ANY recall, instead of
    * needing a measured-100%-recall (i.e. degenerate, prune-free)
    * configuration. ±1 products are exact in float, so the dot product is
    * a deterministic left fold of ±v_i in doubles on both engines.
    */
  def rademacherPlanes(dim: Int, tables: Int, bitsPerTable: Int): Seq[Seq[Seq[Float]]] =
    Seq.tabulate(tables)(t => Seq.tabulate(bitsPerTable)(b => Seq.tabulate(dim) { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"plane:$t:$b:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1.0f else -1.0f
    }))

  /** Sign-bit bucket of `vec` for one table of hyperplanes. */
  def bucketFor(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.foldLeft(lit(0L)) { (acc, plane) =>
      val dot = aggregate(
        zip_with(vec, typedLit(plane), (x, y) => x * y),
        lit(0.0), (s, v) => s + v)
      acc * 2 + when(dot >= 0, 1L).otherwise(0L)
    }

  /** Attach `tables` LSH bucket ids per row: output (…, table_idx, bucket). */
  def withLshBuckets(embs: DataFrame, vecCol: String,
      planes: Seq[Seq[Seq[Float]]]): DataFrame = {
    val buckets = array(planes.zipWithIndex.map { case (tablePlanes, t) =>
      struct(lit(t).as("table_idx"), bucketFor(col(vecCol), tablePlanes).as("bucket"))
    }: _*)
    embs.withColumn("tb", explode(buckets))
      .withColumn("table_idx", col("tb.table_idx"))
      .withColumn("bucket", col("tb.bucket"))
      .drop("tb")
  }

  /** Brute-force exact cosine top-k against a literal query vector.
    * Ties broken by id for determinism.
    */
  def bruteForceTopK(embs: DataFrame, query: Seq[Float], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    embs
      // NULL vectors carry no geometry — excluded from every similarity
      // index/candidate set (the IVF.train contract; oracles mirror with
      // WHERE embedding IS NOT NULL). Zero-norm vectors score NaN and are
      // dropped by the isnan filter on both engines (explicit-quotient
      // oracle: 0/0 -> NULL).
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), typedLit(query)).as("score"))
      .filter(!isnan(col("score")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** ANN top-k: score only vectors sharing an LSH bucket with the query in
    * any table, then exact-rank the candidates. Recall < 1 by construction;
    * tables/bitsPerTable trade recall vs candidate count.
    */
  def annTopK(embs: DataFrame, query: Seq[Float], k: Int,
      planes: Seq[Seq[Seq[Float]]],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val bucketed = withLshBuckets(embs.filter(col(vecCol).isNotNull), vecCol, planes)
    val queryBuckets = planes.zipWithIndex.map { case (tablePlanes, t) =>
      (t, bucketOfVector(query, tablePlanes))
    }
    val probe = queryBuckets
      .map { case (t, b) => col("table_idx") === t && col("bucket") === b }
      .reduce(_ || _)
    bucketed.filter(probe)
      .select(col(idCol), col(vecCol)).dropDuplicates(idCol)
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), typedLit(query)).as("score"))
      .filter(!isnan(col("score")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Driver-side twin of [[bucketFor]] for hashing the query vector.
    * Each product rounds to FLOAT before the double accumulation — exactly
    * what the column form's zip_with(x, y => x * y) does (review r9: a
    * double-exact product here could flip the sign bit of a near-zero
    * Gaussian projection vs the executors, probing a bucket the data row
    * was never assigned to).
    */
  def bucketOfVector(vec: Seq[Float], planes: Seq[Seq[Float]]): Long =
    planes.foldLeft(0L) { (acc, plane) =>
      val dot = vec.zip(plane).map { case (x, y) => (x * y).toDouble }.sum
      acc * 2 + (if (dot >= 0) 1L else 0L)
    }

  /** Exact all-pairs near-duplicates: every (id_a < id_b) pair with cosine ≥
    * threshold. O(n²) scoring — the correctness baseline the LSH variant
    * ([[nearDupPairs]]) is measured against, and the right tool when one side
    * is small enough to broadcast (the join below is a broadcast
    * nested-loop: the build side ships once, the probe side never shuffles).
    * At corpus scale use [[nearDupPairs]]; at 100 TB an all-pairs pass is
    * 10^21 cosines — never viable.
    */
  def exactNearDupPairs(embs: DataFrame, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val nn = embs.filter(col(vecCol).isNotNull) // the null-vector contract
    val a = nn.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = nn.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(!isnan(col("cosine")) && col("cosine") >= threshold)
  }

  /** Embedding near-duplicate pairs: candidates from shared LSH buckets,
    * verified by exact cosine ≥ threshold. The pair join moves only
    * (bucket, id, vector); `maxBucket` caps degenerate buckets.
    * Caching contract as in [[Dedup.verifiedNearDupPairs]]: the returned
    * frame is the one persisted handle (unpersist it when done); the
    * internal bucket-table cache is released before returning.
    */
  def nearDupPairs(embs: DataFrame, threshold: Double,
      planes: Seq[Seq[Seq[Float]]], maxBucket: Int = 1000,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val slim = embs.filter(col(vecCol).isNotNull) // the null-vector contract
      .select(col(idCol), col(vecCol))
    // id-only bucket table (a vector carried through every bucket copy would
    // multiply the shuffle by tables × bucket-size); persisted because the
    // hyperplane dot products feed three consumers (sizes + both join sides)
    val bucketed = withLshBuckets(slim, vecCol, planes)
      .select(col(idCol).as("doc_id"), col("table_idx"), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LSH buckets are FEW and LARGE (n/2^bits docs each) — expand pairs with
    // a shuffle self-join on the bucket key, not Dedup.bucketPairs: the
    // collect_list+lambda expansion evaluates O(bucket²) interpreted
    // expressions per bucket and materializes the whole pair array in one
    // row (OOM risk at scale); a join streams pairs out of the shuffle.
    // Gram/band buckets (tiny, ≤ maxBucket ~100) keep the in-bucket shape.
    val sizes = bucketed.groupBy(col("table_idx"), col("bucket"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
      .select(col("table_idx"), col("bucket"))
    val capped = bucketed.join(sizes, Seq("table_idx", "bucket"), "left_semi")
    // identical subtrees on both sides of the self-join and of the two
    // vector-attach joins (aliases / renames ABOVE the join): per-side
    // projections (`doc_id as id_a`) are not `sameResult`, so the planner
    // shuffled the capped table and scanned the vector side twice; one
    // shared subtree lets ReuseExchange serve the second side for free
    val out = capped.as("a")
      .join(capped.as("b"),
        col("a.table_idx") === col("b.table_idx") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(slim, col("id_a") === col(idCol)).drop(idCol)
      .withColumnRenamed(vecCol, "vec_a")
      .join(slim, col("id_b") === col(idCol)).drop(idCol)
      .withColumnRenamed(vecCol, "vec_b")
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .filter(!isnan(col("cosine")) && col("cosine") >= threshold)
    Dedup.materializeAndRelease(out, bucketed)
  }
}
