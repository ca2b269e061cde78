package graft.io

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC source/sink (S3/K3) round trip against embedded Derby (ships on the
  * Spark classpath) — the reference's MySQL paths exercised for real, not
  * compile-only.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("jdbc append + read round trip, including partitioned parallel read") {
    import spark.implicits._
    val mart = Seq(
      (1L, "Ava Ng", "2023-03", 424.0),
      (2L, "Ben Ray", "2023-03", 50.0),
      (3L, "Cal Ho", "2023-04", 99.5)
    ).toDF("customer_id", "full_name", "sales_month", "total_sales")

    Sinks.jdbcAppend(mart, url, "customers_data_mart", props)
    // append twice → rows accumulate (reference mart semantics, K3)
    Sinks.jdbcAppend(mart.filter(col("customer_id") === 1), url, "customers_data_mart", props)

    val back = Sources.jdbc(spark, url, "customers_data_mart", props)
    assert(back.count() === 4)
    assert(back.filter(col("customer_id") === 1).count() === 2)

    // partitioned read: 2 parallel partitions over the id range
    val partitioned = Sources.jdbc(spark, url, "customers_data_mart", props,
      partitionColumn = Some(("customer_id", 1L, 3L, 2)))
    assert(partitioned.rdd.getNumPartitions === 2)
    assert(partitioned.agg(sum("total_sales")).head().getDouble(0) === 424.0 * 2 + 50.0 + 99.5)
  }
}
