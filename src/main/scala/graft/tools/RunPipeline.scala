package graft.tools

import java.nio.file.{Files, Paths}
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.SparkSession

import graft.etl.Pipeline

/** CLI demo of the composed reference pipeline: generates reference-shaped
  * fixture CSVs (happy + extra-column + quarantine-bound), tiny dimension
  * tables, runs Pipeline.run, and prints the RunReport + output locations.
  *
  *   sbt "runMain graft.tools.RunPipeline [workDir]"
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      Files.createTempDirectory("graft-pipeline-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Seq("inbox", "error", "archive", "out").foreach(d =>
      Files.createDirectories(Paths.get(root, d)))
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(root, "inbox", name), String.join("\n", lines: _*).getBytes)

    write("sales_data.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost",
      "1,121,quaker oats,2023-03-03,1,212.0,2,424.0",
      "2,122,sugar,2023-03-04,4,50.0,1,50.0",
      "1,121,sugar,2023-04-10,1,50.0,2,100.0"))
    write("sales_data_extra.csv", Seq(
      "customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost,payment_mode",
      "2,122,maida,2023-03-05,4,20.0,3,60.0,UPI"))
    write("sales_data_less.csv", Seq(
      "customer_id,product_name,sales_date,sales_person_id,price,quantity,total_cost",
      "9,besan,2023-03-06,2,52.0,1,52.0"))

    val customerDim = Seq(
      (1, "Ava", "Ng", "12 Elm St", "560001", "555-0101", Date.valueOf("2021-01-01")),
      (2, "Ben", "Ray", "9 Oak Ave", "560002", "555-0102", Date.valueOf("2021-02-01")))
      .toDF("customer_id", "first_name", "last_name", "address", "pincode",
        "phone_number", "customer_joining_date")
    val storeDim = Seq(
      (121, "MG Road", "560001", "Dana Kim", Date.valueOf("2020-01-01"), "good"),
      (122, "Hill St", "560004", "Eli Ward", Date.valueOf("2020-06-01"), "ok"))
      .toDF("id", "address", "store_pincode", "store_manager_name",
        "store_opening_date", "reviews")
    val teamDim = Seq(
      (1, "Sam", "Lee", 10, "N", "3 Pine Rd", "560003", Date.valueOf("2022-01-01")),
      (4, "Kit", "Doe", 10, "N", "7 Fir Ln", "560005", Date.valueOf("2022-03-01")))
      .toDF("id", "first_name", "last_name", "manager_id", "is_manager",
        "address", "pincode", "joining_date")

    val layout = Pipeline.Layout(s"$root/inbox", s"$root/error",
      s"$root/archive", s"$root/out", s"$root/ledger")
    val report = Pipeline.run(spark, layout, batchId = "demo-1",
      now = new Timestamp(0L), customerDim, storeDim, teamDim)

    println(s"\n=== Pipeline report ===")
    println(s"batch:           ${report.batchId}")
    println(s"ingested files:  ${report.correctFiles.map(f => Paths.get(f).getFileName).mkString(", ")}")
    println(s"quarantined:     ${report.quarantinedFiles.map(f => Paths.get(f).getFileName).mkString(", ")}")
    println(s"fact rows:       ${report.factRows}")
    println(s"customer mart:   ${report.customerMartRows} rows → $root/out/customers_data_mart")
    println(s"sales mart:      ${report.salesMartRows} rows → $root/out/sales_team_data_mart")
    println(s"\ncustomer mart:")
    spark.read.parquet(s"$root/out/customers_data_mart").orderBy("customer_id", "sales_date_month").show(false)
    println(s"sales mart:")
    spark.read.parquet(s"$root/out/sales_team_data_mart").orderBy("store_id", "sales_month").show(false)
    spark.stop()
  }
}
