package graft.io

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed-table co-located join: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the 100 TB pattern for repeated joins on
  * the same key (SCALE.md "co-locate joins via bucketing").
  */
class BucketingSpec extends SparkSpec {

  test("partitioned write gives partition-pruned reads (PartitionFilters, not data filters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/t"
    spark.read.parquet(s"${sf()}/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), leaving
    // no row-level filter on status
    assert(scan.contains("PartitionFilters") && scan.contains("status"),
      s"expected partition pruning in:\n$scan")
    val full = spark.read.parquet(s"${sf()}/orders.parquet")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() === full)
  }

  test("join of tables bucketed on the join key plans with zero shuffle exchanges") {
    val orders = Tables(spark, sf(), "orders")
    val customer = Tables(spark, sf(), "customer")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bkt")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bkt")
    // force a non-broadcast plan so the shuffle (or its absence) is visible
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === orders.count()) // FK integrity: every order matches
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
