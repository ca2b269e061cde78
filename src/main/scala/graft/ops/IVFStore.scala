package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index with incremental appends — the ANN twin of
  * [[IncrementalDedup]] (r12 verdict: "persisted MinHash signatures / IVF
  * cells ... new-vs-index candidate join, not an all-corpus rebuild").
  *
  * The store IS the classic IVF layout: one parquet directory per cell
  * (`partitionBy("cell")`), each holding the (vec_id, embedding) rows
  * assigned to that centroid. A query probes the `nprobe` nearest cells
  * and reads ONLY their partitions — at 100 TB the scan cost is
  * nprobe/c of the corpus by partition pruning, with no index service in
  * front of the data. Appending a batch assigns ONLY the new vectors
  * (one map-side argmax per vector against the c centroids — no shuffle
  * of stored data, no re-assignment of the corpus).
  *
  * == Equivalence contract ==
  *
  * Cell assignment is a pure per-vector function of the centroids, so a
  * store built by ANY sequence of appends equals the full one-shot
  * assignment of the union — and `topK` equals [[IVF.topK]] over the
  * union with the same index. The centroids are FROZEN at create()
  * (standard IVF practice: retraining re-shuffles every list; production
  * systems rebuild offline and swap). The catalog entry pins this against
  * the same DuckDB oracle as `knn_ivf`, with the batch chosen as the
  * highest vec_ids so the frozen base-trained centroids (first-c-by-id
  * init) are bit-identical to what full-corpus training would init.
  *
  * == Layout / crash safety ==
  *
  * Same generation-delta + commit-marker dance as [[IncrementalDedup]]:
  * `gen=N/cells/cell=C/` part files written first, `_commits/gen=N` last;
  * readers union committed generations only; a crashed append's orphan
  * directory is overwritten by the retry. Centroids persist once at
  * create() (`centroids/` parquet: cell, position, weight) and are
  * re-read on open, so a store survives the JVM that built it.
  */
object IVFStore {

  /** Create a new store at `path` with frozen `index` centroids. */
  def create(spark: SparkSession, path: String, index: IVF.Index): Store = {
    import spark.implicits._
    val rows = index.centroids.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (w, d) => (i, d, w) }
    }
    rows.toDF("cell", "dim", "weight")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    new Store(spark, path, index)
  }

  /** Open an existing store, reloading its frozen centroids. */
  def open(spark: SparkSession, path: String): Store = {
    val rows = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
    require(rows.nonEmpty, s"no centroids at $path — not an IVF store")
    val centroids = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, ds) =>
      ds.sortBy(_._2).map(_._3).toSeq
    }
    new Store(spark, path, IVF.Index(centroids))
  }

  final class Store(spark: SparkSession, root: String, val index: IVF.Index) {

    private def fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def commitDir = new org.apache.hadoop.fs.Path(root, "_commits")
    private def marker(gen: Int) = new org.apache.hadoop.fs.Path(commitDir, s"gen=$gen")

    def committedGens(): Seq[Int] = {
      if (!fs.exists(commitDir)) return Seq.empty
      fs.listStatus(commitDir).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
        .sorted
    }

    /** Assign ONLY the batch's vectors to cells and commit them as a new
      * generation of cell-partitioned parquet. Null vectors drop (the
      * [[IVF.assign]] contract). `crashBeforeCommit` for tests.
      */
    def append(embs: DataFrame, vecCol: String = "embedding", idCol: String = "vec_id",
        crashBeforeCommit: Boolean = false): Unit = {
      val prior = committedGens()
      val gen = if (prior.isEmpty) 0 else prior.max + 1
      IVF.assign(embs, index, vecCol)
        .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"), col("cell"))
        // a generation is batch-scale: a few files per cell partition
        .repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"$root/gen=$gen/cells")
      if (crashBeforeCommit) return
      fs.mkdirs(commitDir)
      fs.create(marker(gen), true).close()
    }

    /** All stored assignments (union of committed generation deltas).
      * `cell` is a partition column — filters on it prune directories.
      */
    def cells(): DataFrame = {
      val gens = committedGens()
      require(gens.nonEmpty, s"IVF store at $root has no committed generation yet")
      // one read per generation root, unioned: multi-path partition
      // discovery rejects sibling gen=N roots as conflicting structures,
      // and per-root reads keep cell-partition pruning intact
      gens.map(g => spark.read.parquet(s"$root/gen=$g/cells")).reduce(_ unionByName _)
    }

    /** ANN top-k over the whole stored corpus: probe the `nprobe` cells
      * nearest the query — the scan reads ONLY those cell partitions
      * (pruned, never the full corpus) — then exact-rank inside them.
      * Equal to [[IVF.topK]] over the union of all appended batches.
      */
    def topK(query: Seq[Float], k: Int, nprobe: Int = 2): DataFrame = {
      val probeCells = index.centroids.zipWithIndex
        .map { case (ctr, i) =>
          i -> graft.functions.CosineSimilarity.compute(query.toArray, ctr.toArray)
        }
        .sortBy { case (i, s) => (-s, i) }
        .take(nprobe).map(_._1)
      cells()
        .filter(col("cell").isin(probeCells: _*)) // partition pruning
        .select(col("vec_id"),
          graft.functions.VectorFunctions.cosine(col("embedding"), typedLit(query)).as("score"))
        .filter(!isnan(col("score")))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(k)
    }
  }
}
