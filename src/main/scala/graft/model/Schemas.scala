package graft.model

import org.apache.spark.sql.types._

/** Schema constants for the reference-shaped ingest path.
  *
  * The fact contract: 8 mandatory CSV columns plus the conformed
  * `additional_column` (reference: src/main/transformations/main.py:229-239;
  * mandatory list resources/dev/config.py:40).
  *
  * Money columns use DoubleType rather than the reference's FloatType — the
  * mart DDL declares DECIMAL(10,2) (table_scripts.sql:154,165-166) and float
  * loses cents at scale; double is the faithful-but-sane middle ground
  * (SURVEY.md §1.2).
  */
object Schemas {

  val mandatoryColumns: Seq[String] = Seq(
    "customer_id", "store_id", "product_name", "sales_date",
    "sales_person_id", "price", "quantity", "total_cost")

  val salesFact: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = true),
    StructField("store_id", IntegerType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("sales_date", DateType, nullable = true),
    StructField("sales_person_id", IntegerType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("total_cost", DoubleType, nullable = true),
    StructField("additional_column", StringType, nullable = true)))
}
