package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.CustomerMart

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator family from SURVEY.md §2 (or a
  * scale extension); [[oracleSql]] carries the DuckDB-equivalent ANSI SQL for
  * hash-verification over the same parquet tables. Column names and types are
  * aligned on both sides (aggregates aliased identically; money sums via the
  * deterministic decimal idiom in [[graft.functions.Cols]]).
  */
object SparkEntry {

  private def t(name: String)(implicit spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    implicit val dir: String = "/root/testdata/sf0.001"
    CustomerMart.monthlyPurchases(t("orders"), t("customer"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "customer_mart" -> { (s, dir) =>
      implicit val sp = s; implicit val d = dir
      CustomerMart.monthlyPurchases(t("orders"), t("customer"))
    },
    "customer_mart_window" -> { (s, dir) =>
      implicit val sp = s; implicit val d = dir
      CustomerMart.monthlyPurchasesWindowIdiom(t("orders"), t("customer"))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val customerMartSql =
      """SELECT c_custkey AS customer_id, c_name AS full_name,
        |  substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS sales_month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3""".stripMargin
    Map(
      "customer_mart" -> customerMartSql,
      "customer_mart_window" -> customerMartSql,
    )
  }
}
