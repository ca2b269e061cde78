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

  test("MySQL-shaped column types round-trip: DECIMAL(10,2), CHAR(1), TEXT") {
    // The reference's tables are MySQL DECIMAL(10,2) / CHAR(1) / TEXT
    // (resources/sql_scripts/table_scripts.sql:148-167). No MySQL server can
    // run in-sandbox, so the dialect-sensitive piece — writing into a
    // PRE-DECLARED table with those exact column types and reading the
    // declared types back through JDBC metadata — is exercised on Derby
    // (TEXT ≈ CLOB), and MySqlDialectSpec pins the MySQL-dialect mapping
    // itself on Spark's public JdbcDialect API.
    import java.sql.DriverManager
    import org.apache.spark.sql.types._
    import spark.implicits._

    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE typed_staging (
        |  file_name VARCHAR(255),
        |  status CHAR(1),
        |  price DECIMAL(10,2),
        |  note CLOB)""".stripMargin)
    finally conn.close()

    val rows = Seq(
      ("sales_a.csv", "A", BigDecimal("12345678.91"), "extra,cols"),
      ("sales_b.csv", "I", BigDecimal("0.05"), null))
      .toDF("file_name", "status", "price", "note")
      .select(col("file_name"), col("status"),
        col("price").cast(DecimalType(10, 2)).as("price"), col("note"))
    Sinks.jdbcAppend(rows, url, "typed_staging", props)

    val back = Sources.jdbc(spark, url, "typed_staging", props)
    // Derby reports unquoted identifiers uppercased — compare case-insensitively
    val byName = back.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    def idx(row: org.apache.spark.sql.Row, name: String): Int =
      row.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    // declared types survive the round trip: exact decimal, not double
    assert(byName("price") === DecimalType(10, 2))
    assert(byName("status") === StringType)
    assert(byName("note") === StringType)
    val a = back.filter(col("file_name") === "sales_a.csv").head()
    assert(a.getDecimal(idx(a, "price")) === new java.math.BigDecimal("12345678.91"))
    assert(a.getString(idx(a, "status")) === "A")
    assert(back.filter(col("status") === "I" && col("note").isNull).count() === 1)
  }
}
