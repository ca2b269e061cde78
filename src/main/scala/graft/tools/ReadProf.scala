package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profile: cost of constructing a parquet relation WITH vs WITHOUT
  * an explicit schema (schema inference reads footers via a tiny Spark job
  * per `spark.read.parquet` call — a per-query fixed cost the bench pays on
  * every run). Not part of the driver contract.
  */
object ReadProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9 / n * 1000}%.1f ms/op ($n ops)")
    }

    val path = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(path).schema

    time("read.parquet construct+analyze", 20) {
      spark.read.parquet(path).filter("l_orderkey > 0").queryExecution.optimizedPlan
    }
    time("read.schema().parquet construct+analyze", 20) {
      spark.read.schema(schema).parquet(path).filter("l_orderkey > 0").queryExecution.optimizedPlan
    }
    time("read.parquet count", 20) {
      spark.read.parquet(path).count()
    }
    time("read.schema().parquet count", 20) {
      spark.read.schema(schema).parquet(path).count()
    }
    // small file: documents
    val dpath = s"$sfDir/documents.parquet"
    val dschema = spark.read.parquet(dpath).schema
    time("documents infer count", 20) { spark.read.parquet(dpath).count() }
    time("documents schema count", 20) { spark.read.schema(dschema).parquet(dpath).count() }
    spark.stop()
  }
}
