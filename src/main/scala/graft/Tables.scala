package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet files: `{sfDir}/{name}.parquet`. Reading
  * through a single entry point keeps scan options consistent and gives one
  * place to attach read-side tuning (e.g. `spark.sql.files.maxPartitionBytes`
  * is session-level; per-scan schema hints could go here).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
