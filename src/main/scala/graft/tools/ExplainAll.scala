package graft.tools

import org.apache.spark.sql.SparkSession

import graft.QueryCatalog

/** Dev: dump formatted physical plans for selected catalog queries —
  * checking PushedFilters / ReadSchema pruning, broadcast joins, and
  * WholeStageCodegen span width.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSet
      else Set("customer_mart", "three_way_join", "filter_isin", "sales_mart_incentive")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryCatalog.all.filter(e => names.contains(e.name)).foreach { e =>
      println(s"\n========== ${e.name} ==========")
      println(e.run(spark, "/root/testdata/sf0.001").queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
