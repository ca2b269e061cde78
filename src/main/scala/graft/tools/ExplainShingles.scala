package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Shingles

/** Dev: show whether the normalize() projection survives into the generator. */
object ExplainShingles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exploded = docs.repartition(col("doc_id"))
      .withColumn("norm", Shingles.normalize(col("text")))
      .filter(length(col("norm")) >= 5)
      .select(col("doc_id"), explode(Shingles.charShingles(col("norm"), 5)).as("sh"))
    println(exploded.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
