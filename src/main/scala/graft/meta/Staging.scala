package graft.meta

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Run-state bookkeeping: the reference's MySQL staging table
  * (product_staging_table, status 'A' active → 'I' inactive;
  * src/main/transformations/main.py:196-225,428-448, pre-flight :46-75).
  *
  * Re-expressed as an append-only parquet ledger keyed by (batch_id,
  * file_name): a run appends ACTIVE rows before processing and INACTIVE rows
  * after success; the *latest* status per file wins. Append-only makes the
  * state machine idempotent and cluster-safe (no in-place UPDATE, which
  * object stores can't do transactionally) — re-running a failed batch
  * appends a fresh ACTIVE generation instead of mutating rows, and the
  * pre-flight check is a one-partition aggregate over a tiny table.
  */
class Staging(spark: SparkSession, ledgerPath: String) {
  import Staging._

  private def ledger: DataFrame = {
    // only a missing ledger means "no prior runs"; any other failure
    // (corruption, permissions, schema drift) must propagate — treating it
    // as empty would silently defeat the pre-flight double-processing guard
    val path = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) spark.createDataFrame(Seq.empty[StagingRow])
    else spark.read.schema(spark.createDataFrame(Seq.empty[StagingRow]).schema).parquet(ledgerPath)
  }

  private def append(rows: Seq[StagingRow]): Unit =
    spark.createDataFrame(rows).write.mode(SaveMode.Append).parquet(ledgerPath)

  private def nextSeq(): Long = Staging.nextSeq(ledger)

  /** Stage files ACTIVE before processing (reference main.py:196-219). */
  def markActive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Active, now, s)))
  }

  /** Flip to INACTIVE after success (reference main.py:428-448). */
  def markInactive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Inactive, now, s)))
  }

  /** Pre-flight: files whose most recent status is still ACTIVE — evidence of
    * a prior failed run (reference main.py:56-75).
    */
  def activeFiles(): Seq[String] = Staging.activeFiles(ledger)
}

object Staging {
  val Active = "A"
  val Inactive = "I"

  /** `seq` is a per-append monotonic ordinal: wall clocks can be coarse or
    * caller-supplied, so latest-wins ordering is (updatedAt, seq) — a fresh
    * ACTIVE generation beats an older INACTIVE row even at the exact same
    * timestamp. `status` desc remains only as a final tie-break WITHIN one
    * append generation (activation + completion recorded in one instant).
    */
  case class StagingRow(batchId: String, fileName: String, status: String,
      updatedAt: Timestamp, seq: Long)

  private[meta] def nextSeq(ledger: DataFrame): Long =
    ledger.agg(coalesce(max(col("seq")), lit(0L))).collect()(0).getLong(0) + 1L

  private[meta] def activeFiles(ledger: DataFrame): Seq[String] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fileName"))
      .orderBy(col("updatedAt").desc, col("seq").desc, col("status").desc)
    ledger
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("status") === Active)
      .select("fileName")
      .collect().map(_.getString(0)).toSeq.sorted
  }
}

/** The same append-only A/I ledger over a JDBC table — the literal analog of
  * the reference's MySQL product_staging_table (table_scripts.sql:6-13),
  * minus the in-place UPDATEs: appends + latest-wins reads keep it
  * idempotent under retries exactly like the parquet ledger.
  */
class JdbcStaging(spark: SparkSession, url: String, table: String,
    props: java.util.Properties) {
  import Staging._

  private def ledger: DataFrame =
    try graft.io.Sources.jdbc(spark, url, table, props)
    catch {
      // first run: the table doesn't exist yet → empty ledger
      case e: Exception if Option(e.getMessage).exists(_.contains("does not exist")) =>
        spark.createDataFrame(Seq.empty[StagingRow])
    }

  private def append(rows: Seq[StagingRow]): Unit =
    graft.io.Sinks.jdbcAppend(spark.createDataFrame(rows), url, table, props)

  private def nextSeq(): Long = Staging.nextSeq(ledger)

  def markActive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Active, now, s)))
  }

  def markInactive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Inactive, now, s)))
  }

  def activeFiles(): Seq[String] = Staging.activeFiles(ledger)
}
