package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Shingles

/** Plan-shape experiment for the sketch stage's normalize double-eval
  * (guide §4.4 shape, r15 verdict item 4): counts how many times the
  * normalize regex and the minhash kernel appear in the EXECUTED plan of
  * candidate shapes, and times them at the bench SF. Not part of the
  * driver contract.
  */
object NormShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 64; val shingleLen = 5

    def kernel(norm: org.apache.spark.sql.Column) =
      graft.functions.TextSketches.minhashSig(norm, shingleLen, k)

    def shapes: Map[String, DataFrame] = Map(
      "A_current" -> docs
        .repartition(col("doc_id"))
        .withColumn("norm", Shingles.normalize(col("text")))
        .filter(octet_length(col("norm")) >= shingleLen)
        .select(col("doc_id"), kernel(col("norm")).as("sig")),
      "B_explode" -> docs
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(filter(array(kernel(Shingles.normalize(col("text")))),
            x => size(x) > 0)).as("sig")),
      "C_nondet_guard" -> docs
        .repartition(col("doc_id"))
        .withColumn("norm",
          when(monotonically_increasing_id() >= 0, Shingles.normalize(col("text"))))
        .filter(octet_length(col("norm")) >= shingleLen)
        .select(col("doc_id"), kernel(col("norm")).as("sig")),
      "D_struct_two_kernels" -> docs
        .repartition(col("doc_id"))
        .select(col("doc_id"), Shingles.normalize(col("text")).as("norm"))
        .select(col("doc_id"),
          Shingles.onceOrDrop(
            struct(kernel(col("norm")).as("sig"),
              graft.functions.TextSketches.charShingleHashes(col("norm"), shingleLen).as("grams")),
            p => size(p.getField("sig")) > 0).as("sk"))
        .select(col("doc_id"), col("sk.sig").as("sig")))

    for ((name, df) <- shapes.toSeq.sortBy(_._1)) {
      val plan = df.queryExecution.executedPlan.toString
      val nRegex = "regexp_replace".r.findAllIn(plan).size
      val nKernel = "minhash".r.findAllIn(plan).size
      System.err.println(s"[shape] $name: regexp_replace x$nRegex, kernel x$nKernel")
      // warm then time 3 runs
      df.write.mode("overwrite").format("noop").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[shape] $name: min ${times.min}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
      // row-count + schema sanity: all shapes must agree with A_current
      System.err.println(s"[shape] $name rows: ${df.count()} schema: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}:${f.nullable}").mkString(",")}")
    }
    spark.stop()
  }
}
