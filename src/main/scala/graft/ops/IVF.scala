package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbour: partition the vector
  * space by a small set of centroids (k-means-lite), search only the
  * `nprobe` cells nearest the query.
  *
  * Complements the random-hyperplane LSH in [[Similarity]]: IVF adapts to
  * the data distribution (clustered embeddings → tight cells), LSH is
  * oblivious but train-free.
  *
  * Determinism: centroid init is the first `c` vectors by id; per-dimension
  * means accumulate as exact decimals (a double sum would make centroids —
  * and therefore assignments — drift run to run). Training is a driver loop
  * of `iters` Spark jobs; each job is one scan + one c×dim aggregate.
  *
  * At 100 TB: train on a sample, then a single pass assigns + writes the
  * table `partitionBy(cell)` so probes read only nprobe/c of the data —
  * same probe-pruning shape as the LSH path (SCALE.md).
  */
object IVF {

  case class Index(centroids: Seq[Seq[Float]]) {
    def dim: Int = centroids.head.size
  }

  /** Column: index of the centroid with max cosine to `vec`. Array-based
    * argmax — a when-chain fold would reference the running best in both
    * branches and double the expression tree per centroid (2^c nodes; hung
    * at c=16). Ties resolve to the lowest index (array_position = first).
    *
    * NaN cosines (a zero-norm vector OR a zero-norm centroid) map to -∞
    * before the argmax: Spark sorts/maxes NaN as GREATER than any double,
    * so one degenerate all-zero centroid would otherwise capture EVERY
    * vector (array_max = NaN → cell = that centroid) and collapse the
    * index to a single cell. With -∞, a degenerate centroid simply never
    * wins, and an all-zero vector lands in cell 0 by the lowest-index tie
    * rule — the same order the oracle replays as `DESC NULLS LAST, cid`
    * (adversarial-corpus sweep, round 10).
    */
  private def cellOf(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    val scores = array(centroids.map(ctr =>
      nanvl(VectorFunctions.cosine(vec, typedLit(ctr)), lit(Double.NegativeInfinity))): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int").as("cell")
  }

  /** Train centroids with `iters` Lloyd steps (cosine assignment,
    * decimal-exact per-dimension means, unit-free — cosine ignores scale).
    */
  def train(embs0: DataFrame, c: Int, iters: Int = 3,
      vecCol: String = "embedding", idCol: String = "vec_id"): Index = {
    // NULL vectors carry no geometry: a null row among the first c ids
    // previously became a null centroid and NPE'd the driver collect
    // (adversarial-corpus sweep, round 10) — excluded from init, training,
    // and (below) assignment/probing, mirrored by the oracles'
    // `WHERE embedding IS NOT NULL`
    val embs = embs0.filter(col(vecCol).isNotNull)
    var centroids: Seq[Seq[Float]] = embs
      .orderBy(col(idCol)).limit(c)
      .select(vecCol).collect().map(_.getSeq[Float](0).toSeq).toSeq
    require(centroids.nonEmpty,
      s"IVF.train: empty embedding input (c=$c) — nothing to cluster")
    val dim = centroids.head.size
    (0 until iters).foreach { _ =>
      val means = embs
        .select(cellOf(col(vecCol), centroids), col(vecCol).as("v"))
        .groupBy(col("cell"))
        .agg(
          count(lit(1)).as("n"),
          (0 until dim).map(d =>
            sum(element_at(col("v"), d + 1).cast(DecimalType(28, 12)))
              .cast(DoubleType).as(s"s$d")): _*)
        .collect()
      val updated = means.map { r =>
        val cell = r.getAs[Int]("cell")
        val n = r.getAs[Long]("n").toDouble
        cell -> (0 until dim).map(d => (r.getAs[Double](s"s$d") / n).toFloat)
      }.toMap
      // empty cells keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (old, i) => updated.getOrElse(i, old) }
    }
    Index(centroids)
  }

  /** Assign each vector to its IVF cell (the write-side of the index).
    * NULL vectors are excluded — see [[train]]. */
  def assign(embs: DataFrame, index: Index, vecCol: String = "embedding"): DataFrame =
    embs.filter(col(vecCol).isNotNull)
      .withColumn("cell", cellOf(col(vecCol), index.centroids))

  /** ANN top-k: probe the `nprobe` cells whose centroids are nearest the
    * query, exact-rank candidates inside them.
    */
  def topK(embs: DataFrame, index: Index, query: Seq[Float], k: Int, nprobe: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val probeCells = index.centroids.zipWithIndex
      .map { case (ctr, i) =>
        i -> graft.functions.CosineSimilarity.compute(query.toArray, ctr.toArray)
      }
      .sortBy { case (i, s) => (-s, i) }
      .take(nprobe).map(_._1)
    assign(embs, index, vecCol)
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), typedLit(query)).as("score"))
      .filter(!isnan(col("score")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
