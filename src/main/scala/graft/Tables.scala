package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet files: `{sfDir}/{name}.parquet`. Reading
  * through a single entry point keeps scan options consistent and gives one
  * place to attach read-side tuning (e.g. `spark.sql.files.maxPartitionBytes`
  * is session-level; per-scan schema hints could go here).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Events-epoch derivations rely on `unix_micros(CAST(ts AS TIMESTAMP))`
    * being epoch-identity on the NTZ column — true iff the session timezone
    * is UTC. Every graft main pins UTC, but nothing forces a library caller
    * to: a non-UTC session would silently shift every events-derived epoch
    * (ADVICE r9). Fail loudly at the derivation site instead.
    */
  def requireUtcSession(spark: SparkSession, who: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val utc =
      try java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS)
        .normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    require(utc, s"$who derives microsecond epochs from a TIMESTAMP_NTZ " +
      s"column via an NTZ→LTZ cast, which is only epoch-identity under " +
      s"UTC; session timezone is '$tz'. Set " +
      "spark.sql.session.timeZone=UTC on this session before calling.")
  }
}
