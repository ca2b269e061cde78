package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All tables are plain parquet files: `{sfDir}/{name}.parquet`. Reading
  * through a single entry point keeps scan options consistent and gives one
  * place to attach read-side tuning.
  *
  * Schema inference is paid ONCE per path per JVM: a bare
  * `spark.read.parquet` re-reads footers (a ~100 ms driver+job round trip
  * on this box) every time a query constructs its input relation, and the
  * bench constructs every relation 6× per query. The testdata is immutable
  * for a process lifetime, so the first read's inferred schema is cached
  * and every later construction passes it explicitly — the guide's
  * "driver-side work shows up as nothing running" cost (§7.3), removed at
  * the shared entry point. The DATA is still read in full by every query;
  * only the footer-sniffing round trip is skipped.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

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
