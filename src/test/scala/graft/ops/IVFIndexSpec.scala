package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The write-side of the ANN scale path: persist the IVF assignment
  * partitioned by cell, probe with a partition filter, and confirm the scan
  * prunes to the probed cells (SCALE.md "probes prune parquet partitions
  * instead of scanning").
  */
class IVFIndexSpec extends SparkSpec {

  test("probing a partitionBy(cell) index reads only the probed partitions") {
    val embs = Tables(spark, sf(), "embeddings")
    val index = IVF.train(embs, c = 8, iters = 1)
    val dir = Files.createTempDirectory("graft-ivf").toString + "/index"
    IVF.assign(embs, index).write.partitionBy("cell").parquet(dir)

    val probed = spark.read.parquet(dir).filter(col("cell").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    // partition pruning visible in the scan: the cell filter moves into
    // PartitionFilters, leaving no post-scan Filter on cell
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected partition filters in:\n$plan")
    val cells = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1)))
    // and the index round-trips the full table
    assert(spark.read.parquet(dir).count() === embs.count())
  }

  test("Lloyd training is deterministic and moves centroids off the init") {
    // the correctness gate pins the iters=0 (static-init) probe path
    // cross-engine; TRAINING determinism — decimal-exact means, so two
    // runs give bit-identical centroids — is pinned here instead
    val embs = Tables(spark, sf(), "embeddings")
    val a = IVF.train(embs, c = 8, iters = 2)
    val b = IVF.train(embs, c = 8, iters = 2)
    assert(a.centroids === b.centroids, "training must be run-to-run deterministic")
    val init = IVF.train(embs, c = 8, iters = 0)
    assert(a.centroids !== init.centroids, "two Lloyd steps must update the init")
    // every vector still lands in a valid cell after training
    val cells = IVF.assign(embs, a).select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 8))
  }

  test("static-init assignment sends each seed vector to its own cell") {
    // iters = 0 centroids ARE the first c vectors; cosine(v, v) = 1 is the
    // unique max, so vec_id i < c must land in cell i — a sharp check on
    // the argmax/tie-break the knn_ivf oracle replays
    val embs = Tables(spark, sf(), "embeddings")
    val index = IVF.train(embs, c = 8, iters = 0)
    val own = IVF.assign(embs, index)
      .filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), col("cell"))
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    own.foreach { case (id, cell) => assert(id === cell) }
  }
}
