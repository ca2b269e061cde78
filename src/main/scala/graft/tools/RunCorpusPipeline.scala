package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.CorpusPipeline

/** CLI demo of the composed training-corpus curation: curate the documents
  * table (quality gate → exact dedup → decontaminate vs the %10 benchmark
  * slice → split assignment), write the kept corpus partitioned by split,
  * and print the attrition funnel.
  *
  *   sbt "runMain graft.tools.RunCorpusPipeline [sfDir] [outDir]"
  */
object RunCorpusPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse(
      Files.createTempDirectory("graft-corpus-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = all.filter(col("doc_id") % 10 =!= 0)
    val bench = all.filter(col("doc_id") % 10 === 0)
    val curated = CorpusPipeline.curate(train, bench, n = 8,
      requireTerminalPunct = false)

    curated.write.partitionBy("split").mode("overwrite").parquet(s"$outDir/corpus")

    val kept = spark.read.parquet(s"$outDir/corpus")
    println(s"[corpus] input train docs: ${train.count()}  (benchmark: ${bench.count()})")
    println(s"[corpus] kept after curation: ${kept.count()}")
    kept.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("split"))
      .collect()
      .foreach(r => println(
        s"[corpus]   ${r.getString(0).padTo(6, ' ')} ${r.getLong(1)} docs, ${r.get(2)} chars"))
    println(s"[corpus] written to $outDir/corpus (partitioned by split)")
    spark.stop()
  }
}
