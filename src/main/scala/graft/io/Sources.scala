package graft.io

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY.md §2.1).
  *
  * S1 header-probe and S2 inferred CSV scans live in
  * [[graft.etl.Validation]]; this module holds the generic readers.
  */
object Sources {

  /** S2: full CSV scan with header + type inference. */
  def csv(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(paths: _*)

  /** CSV scan with an explicit contract schema — preferred at scale: no
    * inference pass, stable types. With `corruptCol` set, malformed rows
    * land in that column (PERMISSIVE) instead of silently nulling — the
    * row-level twin of the file-level quarantine in etl.Validation.
    * The corrupt column must also appear (as a string field) in `schema`.
    */
  def csvWithSchema(spark: SparkSession, schema: StructType, paths: Seq[String],
      corruptCol: Option[String] = None): DataFrame = {
    val reader = spark.read.option("header", "true").schema(schema)
    corruptCol
      .map(c => reader.option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", c))
      .getOrElse(reader)
      .csv(paths: _*)
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines scan. Pass an explicit schema at scale (inference reads the
    * data twice); without one, Spark samples/infers like CSV.
    */
  def json(spark: SparkSession, paths: Seq[String],
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(paths: _*)
  }

  /** ORC scan — columnar alternative when the lake standard is ORC;
    * same pushdown/pruning behavior as parquet under Catalyst.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S3: JDBC table scan (reference: src/main/read/database_read.py:6-10,
    * which reads single-partition). For big tables pass a partition column so
    * the read parallelizes across executors — the reference's single-pull
    * would bottleneck one task at scale.
    */
  def jdbc(spark: SparkSession, url: String, table: String, props: Properties,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((colName, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, colName, lower, upper, numParts, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** S4: empty relation with an explicit schema (union seed;
    * reference: main.py:246).
    */
  def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
