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
  *
  * CONCURRENCY CONTRACT (ADVICE r8): concurrent writers are safe as long
  * as their FILE SETS don't overlap — appends never corrupt (append-only),
  * and the writer nonce keeps latest-wins deterministic under any
  * interleaving. Two writers racing on the SAME file are out of contract:
  * the pre-flight `activeFiles` guard is a read-then-act check with no
  * cross-writer lock, so one writer's in-flight ACTIVE generation can be
  * shadowed by the other's INACTIVE on the nonce tie-break and both may
  * process the file (determinism ≠ mutual exclusion). Like the reference
  * (whose MySQL pre-flight has the same read-then-act window,
  * main.py:56-75), single-writer-per-file scheduling is the caller's
  * responsibility — partition the ingest prefix per writer, or serialize
  * batches that share files.
  */
class Staging(spark: SparkSession, ledgerPath: String) {
  import Staging._

  // collision disambiguator: nextSeq is a read-modify-write, so two
  // concurrent writers can mint the SAME seq (ADVICE r7). Appends are still
  // safe (append-only ledger), and latest-wins stays deterministic because
  // the writer nonce breaks (updatedAt, seq) ties totally — no two rows from
  // different writers ever compare equal on the full ordering key.
  private val writerId = java.util.UUID.randomUUID().toString

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
    append(files.map(f => StagingRow(batchId, f, Active, now, s, writerId)))
  }

  /** Flip to INACTIVE after success (reference main.py:428-448). */
  def markInactive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Inactive, now, s, writerId)))
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
    * timestamp. `writer` is a per-Staging-instance nonce: nextSeq is a
    * read-modify-write, so two CONCURRENT writers can mint the same seq;
    * the nonce makes the ordering key total, so latest-wins stays
    * deterministic under interleaving (each writer's own A→I flow is
    * correctly ordered by seq because its INACTIVE mint reads its own
    * ACTIVE append). `status` desc remains only as a final tie-break WITHIN
    * one append generation (activation + completion recorded in one
    * instant). Ledgers written before the nonce existed read back with a
    * null writer — ordered after nonced rows at the same (updatedAt, seq),
    * which can only matter for ties that were already ambiguous.
    */
  case class StagingRow(batchId: String, fileName: String, status: String,
      updatedAt: Timestamp, seq: Long, writer: String = "")

  private[meta] def nextSeq(ledger: DataFrame): Long =
    ledger.agg(coalesce(max(col("seq")), lit(0L))).collect()(0).getLong(0) + 1L

  private[meta] def activeFiles(ledger: DataFrame): Seq[String] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fileName"))
      .orderBy(col("updatedAt").desc, col("seq").desc,
        col("writer").desc_nulls_last, col("status").desc)
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

  // same concurrent-writer disambiguator as the parquet ledger
  private val writerId = java.util.UUID.randomUUID().toString

  // Missing-table detection across dialects (review r9): MySQL — the
  // reference's actual database — says "Table 'x.y' doesn't exist"
  // (SQLSTATE 42S02), Postgres 42P01, Derby "Table/View does not exist"
  // (42X05). Walk the cause chain: Spark wraps the driver's SQLException.
  // SQLSTATE decides; the message heuristic is a last resort applied ONLY
  // to the innermost SQLException — matched against every throwable's
  // message it also swallowed non-missing-table failures that merely
  // contain the phrase ("database does not exist", auth errors), turning
  // them into a silent empty ledger (ADVICE r9). When the heuristic does
  // decide, log loudly: an empty-ledger pre-flight on a wrong guess would
  // report nothing active instead of surfacing the real error.
  private def missingTable(e: Throwable): Boolean = {
    var t: Throwable = e
    var innermostSql: java.sql.SQLException = null
    while (t != null) {
      t match {
        case s: java.sql.SQLException =>
          s.getSQLState match {
            case "42S02" | "42P01" | "42X05" => return true
            case _ =>
          }
          innermostSql = s
        case _ =>
      }
      t = t.getCause
    }
    val byMessage = innermostSql != null && {
      val m = Option(innermostSql.getMessage).getOrElse("")
      m.contains("does not exist") || m.contains("doesn't exist")
    }
    if (byMessage)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"JdbcStaging: treating table '$table' as missing via the message " +
          s"heuristic (no missing-table SQLSTATE in the cause chain): " +
          innermostSql.getMessage)
    byMessage
  }

  private def ledger: DataFrame = {
    val df =
      try graft.io.Sources.jdbc(spark, url, table, props)
      catch {
        // first run: the table doesn't exist yet → empty ledger
        case e: Exception if missingTable(e) =>
          spark.createDataFrame(Seq.empty[StagingRow])
      }
    // a JDBC ledger reads with the TABLE's schema (unlike the parquet path's
    // explicit one): pre-nonce tables lack the writer column, which would
    // make activeFiles' ordering fail to resolve (review r8) — surface it
    // as null; the doc'd null-writer ordering then applies. Appends migrate
    // the table first (ensureWriterColumn).
    // Unquoted DDL uppercases the identifier on Derby/H2/Oracle, so the
    // migrated column reads back as WRITER — match case-insensitively or
    // withColumn (which resolves case-insensitively) would null the real
    // nonce values out of every read.
    if (df.columns.exists(_.equalsIgnoreCase("writer"))) df
    else df.withColumn("writer", lit(null).cast("string"))
  }

  // Legacy (pre-nonce) tables lack the writer column, so jdbcAppend would
  // die mid-append with an opaque driver error (ADVICE r8). Detect once per
  // instance and issue the one-time ALTER TABLE ... ADD COLUMN — additive
  // and nullable, so existing rows read back as null writer with the
  // documented ordering; a missing table needs nothing (the first append
  // creates it with the full schema).
  private var schemaEnsured = false
  private def ensureWriterColumn(): Unit = if (!schemaEnsured) {
    // Case-insensitive: the unquoted ALTER below stores WRITER on databases
    // that uppercase identifiers, and re-issuing it there throws
    // "column already exists" on every append from a fresh instance.
    val needsAlter =
      try !graft.io.Sources.jdbc(spark, url, table, props)
        .columns.exists(_.equalsIgnoreCase("writer"))
      catch {
        // only a MISSING table needs nothing (first append creates the full
        // schema); any other probe failure is transient — rethrow without
        // latching schemaEnsured, so the next append re-probes instead of
        // dying mid-append against an unmigrated table forever after.
        case e: Exception if missingTable(e) => false
      }
    if (needsAlter) {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"ALTER TABLE $table ADD COLUMN writer VARCHAR(36)")
        finally st.close()
      } finally conn.close()
    }
    schemaEnsured = true
  }

  private def append(rows: Seq[StagingRow]): Unit = {
    ensureWriterColumn()
    graft.io.Sinks.jdbcAppend(spark.createDataFrame(rows), url, table, props)
  }

  private def nextSeq(): Long = Staging.nextSeq(ledger)

  def markActive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Active, now, s, writerId)))
  }

  def markInactive(batchId: String, files: Seq[String], now: Timestamp): Unit = {
    val s = nextSeq()
    append(files.map(f => StagingRow(batchId, f, Inactive, now, s, writerId)))
  }

  def activeFiles(): Seq[String] = Staging.activeFiles(ledger)
}
