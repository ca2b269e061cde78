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
  *
  * == Deletion / compaction ==
  *
  * [[Store.delete]] commits a TOMBSTONE generation (`gen=N/deletes/` of
  * vec_ids, flagged by a `_tombstones/gen=N` kind marker written BEFORE
  * the commit marker): no cell data moves — the doc is masked at read
  * time, with a tombstone at generation dg hiding rows from every
  * generation g <= dg (a later re-append resurrects the id). With no
  * tombstones the read path is the join-free multi-path union; while they
  * exist, reads pay a per-vector latest-event join (takedown sets are
  * tiny — AQE broadcasts), and the probe's cell filter still pushes below
  * the join so partition pruning is preserved. [[Store.compact]] folds
  * every generation into one — applying tombstones for real — and commits
  * via a `_compactions/gen=N` marker that makes readers ignore all lower
  * generations, so the old-directory sweep is lazy-safe (same dance as
  * [[IncrementalDedup.SignatureStore.compact]]).
  */
object IVFStore {

  /** Create a new store at `path` with frozen `index` centroids.
    *
    * Alongside the centroids, a `_config` file persists the search
    * conventions that otherwise live in calling code — vector dimension,
    * cell count, metric, and the store's default `nprobe` — so a reader
    * opening the store months later probes it the way it was built
    * (IncrementalDedup's `_config` discipline applied to the ANN twin;
    * r13 open thread). `open()` refuses a store whose persisted config
    * disagrees with its centroids.
    */
  def create(spark: SparkSession, path: String, index: IVF.Index,
      defaultNprobe: Int = 2): Store = {
    import spark.implicits._
    require(index.centroids.nonEmpty, "an IVF index needs at least one centroid")
    require(index.centroids.forall(_.size == index.dim),
      s"ragged centroids: all must have dim=${index.dim}")
    require(defaultNprobe >= 1 && defaultNprobe <= index.centroids.size,
      s"defaultNprobe=$defaultNprobe must be in [1, ${index.centroids.size}]")
    val rows = index.centroids.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (w, d) => (i, d, w) }
    }
    rows.toDF("cell", "dim", "weight")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_config"), true)
    try out.write(configLine(index, defaultNprobe).getBytes("UTF-8"))
    finally out.close()
    new Store(spark, path, index, defaultNprobe)
  }

  private def configLine(index: IVF.Index, defaultNprobe: Int): String =
    s"dim=${index.dim};cells=${index.centroids.size};metric=cosine;" +
      s"defaultNprobe=$defaultNprobe"

  /** Open an existing store, reloading its frozen centroids and persisted
    * search config, and verifying they agree (a truncated or foreign
    * centroids file must fail loudly, not probe wrongly).
    */
  def open(spark: SparkSession, path: String): Store = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cfgPath = new org.apache.hadoop.fs.Path(path, "_config")
    require(fs.exists(cfgPath), s"no _config at $path — not an IVF store")
    val in = fs.open(cfgPath)
    val cfg = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val kv = cfg.split(";").map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    require(kv.get("metric").contains("cosine"),
      s"IVF store at $path uses metric=${kv.getOrElse("metric", "?")}; this build supports cosine")
    val rows = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2)))
    require(rows.nonEmpty, s"no centroids at $path — not an IVF store")
    val centroids = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, ds) =>
      ds.sortBy(_._2).map(_._3).toSeq
    }
    val index = IVF.Index(centroids)
    require(kv.get("cells").contains(centroids.size.toString) &&
        kv.get("dim").contains(index.dim.toString),
      s"IVF store at $path: _config says dim=${kv.getOrElse("dim", "?")}/" +
        s"cells=${kv.getOrElse("cells", "?")} but the centroids file holds " +
        s"dim=${index.dim}/cells=${centroids.size} — store is corrupt or mixed")
    new Store(spark, path, index, kv("defaultNprobe").toInt)
  }

  final class Store(spark: SparkSession, root: String, val index: IVF.Index,
      val defaultNprobe: Int = 2) {

    private def fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def commitDir = new org.apache.hadoop.fs.Path(root, "_commits")
    private def tombstoneDir = new org.apache.hadoop.fs.Path(root, "_tombstones")
    private def compactionDir = new org.apache.hadoop.fs.Path(root, "_compactions")
    private def marker(gen: Int) = new org.apache.hadoop.fs.Path(commitDir, s"gen=$gen")
    private def tombstoneMarker(gen: Int) =
      new org.apache.hadoop.fs.Path(tombstoneDir, s"gen=$gen")
    private def compactionMarker(gen: Int) =
      new org.apache.hadoop.fs.Path(compactionDir, s"gen=$gen")

    private def markerGens(dir: org.apache.hadoop.fs.Path): Seq[Int] = {
      if (!fs.exists(dir)) return Seq.empty
      fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
        .sorted
    }

    /** Committed generations, ascending; a committed compaction supersedes
      * everything below it (see [[IncrementalDedup]] — the fold's commit
      * point is the marker, not the cleanup).
      */
    def committedGens(): Seq[Int] = {
      val committed = markerGens(commitDir)
      val floor = markerGens(compactionDir).filter(committed.contains)
        .sorted.lastOption.getOrElse(Int.MinValue)
      committed.filter(_ >= floor)
    }

    /** Committed TOMBSTONE generations, ascending. */
    def deleteGens(): Seq[Int] = {
      val committed = committedGens().toSet
      markerGens(tombstoneDir).filter(committed)
    }

    /** Keys of every idempotent mutation already committed — stored as
      * the commit markers' contents, so "committed" and "key recorded"
      * land in the SAME file create and cannot tear apart (the
      * [[IncrementalDedup.SignatureStore.appliedKeys]] contract applied
      * to the ANN store; [[compact]] folds keys into its own marker so
      * dedup survives compaction).
      */
    def appliedKeys(): Set[String] =
      committedGens().flatMap { g =>
        val in = fs.open(marker(g))
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        content.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      }.toSet

    private def commitMarker(gen: Int, keys: Iterable[String]): Unit = {
      fs.mkdirs(commitDir)
      val out = fs.create(marker(gen), true)
      try out.write(keys.mkString("\n").getBytes("UTF-8")) finally out.close()
    }

    /** Assign ONLY the batch's vectors to cells and commit them as a new
      * generation of cell-partitioned parquet. Null vectors drop (the
      * [[IVF.assign]] contract), but a WRONG-DIMENSION vector fails the
      * append loudly: its cosine vs every centroid is NaN, so it would
      * otherwise be silently filed in cell 0 and never retrievable (probe
      * scores are NaN-filtered) — stored-but-invisible corruption. The
      * guard is one map-side `size()` per row. `crashBeforeCommit` for
      * tests.
      */
    def append(embs: DataFrame, vecCol: String = "embedding", idCol: String = "vec_id",
        crashBeforeCommit: Boolean = false,
        idempotencyKey: Option[String] = None): Unit = {
      if (idempotencyKey.exists(appliedKeys().contains)) return
      val prior = committedGens()
      val gen = if (prior.isEmpty) 0 else prior.max + 1
      val guarded = embs.withColumn(vecCol,
        when(col(vecCol).isNotNull && size(col(vecCol)) =!= lit(index.dim),
          raise_error(concat(
            lit(s"IVF store at $root holds dim=${index.dim} vectors; batch row has dim="),
            size(col(vecCol)).cast("string"))))
          .otherwise(col(vecCol)))
      IVF.assign(guarded, index, vecCol)
        .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"), col("cell"))
        // a generation is batch-scale: a few files per cell partition
        .repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"$root/gen=$gen/cells")
      // a batch with zero assignable vectors (empty micro-batch, all-null
      // embeddings) leaves a ZERO-FILE dynamic-partition dir — committing
      // it would poison every later read with schema-inference failure.
      // An empty append is a no-op: union with ∅ changes nothing
      val genDir = new org.apache.hadoop.fs.Path(s"$root/gen=$gen/cells")
      val files = fs.listFiles(genDir, true)
      var hasData = false
      while (!hasData && files.hasNext) {
        val f = files.next()
        hasData = f.isFile && !f.getPath.getName.startsWith("_")
      }
      if (!hasData) {
        // NOTE: the idempotency key is deliberately NOT recorded — with no
        // generation there is nothing a replay could duplicate, and the
        // replayed empty batch lands here again as the same no-op
        fs.delete(new org.apache.hadoop.fs.Path(root, s"gen=$gen"), true)
        return
      }
      if (crashBeforeCommit) return
      // a crashed delete()/compact() at this number may have left a kind
      // marker; clear both or this append would read as one
      fs.delete(tombstoneMarker(gen), false)
      fs.delete(compactionMarker(gen), false)
      commitMarker(gen, idempotencyKey.toSeq)
    }

    /** Delete vectors from the index (takedown / opt-out). Commits a
      * tombstone generation carrying only the ids — O(ids), no cell data
      * is rewritten; reads mask, [[compact]] erases.
      */
    def delete(ids: DataFrame, idCol: String = "vec_id",
        crashBeforeCommit: Boolean = false,
        idempotencyKey: Option[String] = None): Unit = {
      if (idempotencyKey.exists(appliedKeys().contains)) return
      val prior = committedGens()
      require(prior.nonEmpty, s"IVF store at $root has no committed generation yet")
      val gen = prior.max + 1
      ids.select(col(idCol).as("vec_id")).distinct()
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$root/gen=$gen/deletes")
      if (crashBeforeCommit) return
      // kind marker FIRST, commit marker LAST: a torn delete is wholly
      // invisible, never a committed delete whose tombstones are missed.
      // Clear an orphaned compaction marker (crashed compact()) — a
      // committed gen carrying both kinds would truncate the store.
      fs.delete(compactionMarker(gen), false)
      fs.mkdirs(tombstoneDir)
      fs.create(tombstoneMarker(gen), true).close()
      commitMarker(gen, idempotencyKey.toSeq)
    }

    /** All LIVE assignments (union of committed generation deltas minus
      * tombstones). `cell` is a partition column — filters on it prune
      * directories, including through the tombstone mask join (the filter
      * pushes below it to the scans).
      */
    def cells(): DataFrame = {
      val gens = committedGens()
      require(gens.nonEmpty, s"IVF store at $root has no committed generation yet")
      val dels = deleteGens()
      val dataGens = gens.filterNot(dels.toSet)
      // one read per generation root, unioned: multi-path partition
      // discovery rejects sibling gen=N roots as conflicting structures,
      // and per-root reads keep cell-partition pruning intact
      if (dels.isEmpty)
        dataGens.map(g => spark.read.parquet(s"$root/gen=$g/cells")).reduce(_ unionByName _)
      else {
        val rows = dataGens.map(g =>
          spark.read.parquet(s"$root/gen=$g/cells").withColumn("g", lit(g)))
          .reduce(_ unionByName _)
        // per-vector latest tombstone: a row from generation g is live
        // unless some tombstone at dg >= g covers it (re-append at
        // g > dg resurrects). Tombstones are takedown-scale — AQE
        // broadcasts; compact() restores the join-free path.
        val ts = dels.map(g =>
          spark.read.parquet(s"$root/gen=$g/deletes").withColumn("dg", lit(g)))
          .reduce(_ unionByName _)
          .groupBy("vec_id").agg(max("dg").as("dg"))
        rows.join(ts, Seq("vec_id"), "left")
          .filter(col("dg").isNull || col("g") > col("dg"))
          .drop("g", "dg")
      }
    }

    /** Fold all generations into one, applying tombstones for real, and
      * commit via the compaction kind marker (readers then ignore lower
      * generations, so the sweep below is lazy-safe).
      */
    def compact(): Unit = {
      val gens = committedGens()
      if (gens.size <= 1) return
      val gen = gens.max + 1
      val keys = appliedKeys() // survive the fold — idempotence outlives it
      cells()
        .repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"$root/gen=$gen/cells")
      fs.delete(tombstoneMarker(gen), false)
      fs.mkdirs(compactionDir)
      fs.create(compactionMarker(gen), true).close()
      commitMarker(gen, keys)
      (markerGens(commitDir) ++ markerGens(tombstoneDir) ++
        markerGens(compactionDir)).distinct.filter(_ < gen).foreach { g =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"gen=$g"), true)
        fs.delete(marker(g), false)
        fs.delete(tombstoneMarker(g), false)
        fs.delete(compactionMarker(g), false)
      }
    }

    /** ANN top-k over the whole stored corpus: probe the `nprobe` cells
      * nearest the query (defaulting to the store's persisted
      * `defaultNprobe`) — the scan reads ONLY those cell partitions
      * (pruned, never the full corpus) — then exact-rank inside them.
      * Equal to [[IVF.topK]] over the union of all appended batches minus
      * deleted ids.
      */
    def topK(query: Seq[Float], k: Int, nprobe: Int = defaultNprobe): DataFrame = {
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
