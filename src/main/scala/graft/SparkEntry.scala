package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.CustomerMart

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query definitions live in [[QueryCatalog]]; this object just adapts them
  * to the driver's Map-shaped contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    CustomerMart.monthlyPurchases(
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(e => e.name -> e.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.collect { case CatalogEntry(n, _, Some(sql)) => n -> sql }.toMap
}
