package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{FileLifecycle, Sinks}
import graft.meta.Staging

/** The composed batch pipeline — the reference's end-to-end run
  * (src/main/transformations/main.py top-to-bottom, SURVEY.md §3.1) as one
  * idempotent library call:
  *
  *  pre-flight (leftover ACTIVE files) → list inbox → validate headers →
  *  quarantine bad files → stage ACTIVE → conform+union correct files →
  *  enrich with dimensions → customer & sales marts → parquet sinks
  *  (plain + partitioned) → archive inputs → stage INACTIVE.
  *
  * Differences from the reference, by design:
  *  - union covers ALL correct files (the reference's loop-indentation bug
  *    keeps only the last — SURVEY.md §2.9);
  *  - staging is an append-only ledger, not in-place UPDATEs (object-store
  *    safe, idempotent re-runs — graft.meta.Staging);
  *  - no interactive `input()` hold; failures propagate instead of being
  *    swallowed.
  *
  * Dirs are generic paths (local fs in tests; object-store mounts on a
  * cluster). Dimension joins accept any dim DataFrames (parquet, JDBC, …).
  */
object Pipeline {

  case class Layout(
      inboxDir: String,
      errorDir: String,
      archiveDir: String,
      outputDir: String,
      ledgerPath: String)

  case class RunReport(
      batchId: String,
      correctFiles: Seq[String],
      quarantinedFiles: Seq[String],
      factRows: Long,
      customerMartRows: Long,
      salesMartRows: Long)

  /** Run one batch over every CSV currently in the inbox. */
  def run(spark: SparkSession, layout: Layout, batchId: String, now: Timestamp,
      customerDim: DataFrame, storeDim: DataFrame, salesTeamDim: DataFrame): RunReport = {

    val staging = new Staging(spark, layout.ledgerPath)
    val leftover = staging.activeFiles()
    require(leftover.isEmpty,
      s"pre-flight: previous run left ACTIVE files ${leftover.mkString(",")} — investigate before re-running")

    val inbox = FileLifecycle.list(layout.inboxDir, ".csv")
    require(inbox.nonEmpty, s"no CSV files in ${layout.inboxDir}")

    val split = Validation.partitionFiles(spark, inbox)
    val quarantined = FileLifecycle.moveTo(split.error, layout.errorDir)

    staging.markActive(batchId, split.correct.map(fileName), now)

    // probe results from validation feed the union (no second header pass);
    // the cached fact is read once from CSV (incl. the inferSchema pass) and
    // reused by the count + all three sinks
    val fact = Validation
      .readConformedUnion(spark, split.correct, knownColumns = split.columns)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val factRows = fact.count()
    val enriched = SalesEnrichment.enrich(fact, customerDim, storeDim, salesTeamDim)

    val customerMart = SalesEnrichment.customerMart(enriched)
    val salesMart = SalesEnrichment.salesMart(enriched)

    Sinks.parquet(customerMart, s"${layout.outputDir}/customers_data_mart")
    Sinks.parquet(salesMart, s"${layout.outputDir}/sales_team_data_mart")
    Sinks.partitionedParquet(
      enriched, s"${layout.outputDir}/sales_partitioned",
      Seq("sales_month", "store_id"))
    fact.unpersist()

    // mart row counts from the materialized sinks, not a re-run of the DAG
    val cmRows = spark.read.parquet(s"${layout.outputDir}/customers_data_mart").count()
    val smRows = spark.read.parquet(s"${layout.outputDir}/sales_team_data_mart").count()

    FileLifecycle.moveTo(split.correct, layout.archiveDir)
    staging.markInactive(batchId, split.correct.map(fileName), now)

    RunReport(batchId, split.correct, quarantined, factRows, cmRows, smRows)
  }

  private def fileName(path: String): String =
    new org.apache.hadoop.fs.Path(path).getName
}
