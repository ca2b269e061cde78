package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestStreamSpec extends SparkSpec {

  private def write(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), String.join("\n",
      ("customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost"
        +: rows): _*).getBytes)

  test("checkpointed ingest is exactly-once per file across reruns") {
    val root = Files.createTempDirectory("graft-ingest-stream").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    val out = s"$root/out"; val ckpt = s"$root/ckpt"

    write(inbox, "day1.csv", Seq(
      "1,121,sugar,2023-03-03,1,50.0,2,100.0",
      "2,122,maida,2023-03-04,4,20.0,1,20.0"))
    IngestStream.runOnce(spark, inbox, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // rerun with no new files: nothing re-processed
    IngestStream.runOnce(spark, inbox, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // a new file arrives; only it is appended (day1 not duplicated)
    write(inbox, "day2.csv", Seq(
      "3,123,besan,2023-03-05,7,52.0,1,52.0"))
    IngestStream.runOnce(spark, inbox, out, ckpt)
    val result = spark.read.parquet(out)
    assert(result.count() === 3)
    assert(result.filter(col("customer_id") === 1).count() === 1)
    // schema carries the conform contract (9 columns incl additional_column)
    assert(result.columns.toSet === graft.model.Schemas.salesFact.fields.map(_.name).toSet)
  }

  test("malformed rows are filtered by the corrupt-record gate") {
    val root = Files.createTempDirectory("graft-ingest-bad").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    write(inbox, "mixed.csv", Seq(
      "1,121,sugar,2023-03-03,1,50.0,2,100.0",
      "2,122,maida,notadate,4,20.0,oops,20.0"))
    IngestStream.runOnce(spark, inbox, s"$root/out", s"$root/ckpt")
    val result = spark.read.parquet(s"$root/out")
    assert(result.count() === 1)
    assert(result.head().getAs[Int]("customer_id") === 1)
  }
}
