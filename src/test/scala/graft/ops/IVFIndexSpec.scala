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
}
