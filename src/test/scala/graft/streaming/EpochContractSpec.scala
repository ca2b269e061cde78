package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDateTime

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The watermarked-entry epoch contract (EventsStream.epochOk) on inputs
  * no driver corpus produces: a corpus that is ENTIRELY pre-epoch. Every
  * watermarked entry must return an empty result — the left-outer join's
  * completeness cutoff in particular must take its null-guard branch
  * (both sides empty post-epoch → least() is null) instead of NPE-ing.
  */
class EpochContractSpec extends SparkSpec {

  /** Single-file events.parquet (the driver corpus layout — the entries
    * read with pathGlobFilter=events.parquet, which matches leaf FILES, so
    * a Spark output DIRECTORY of part files would match nothing).
    */
  private lazy val preEpochDir: String = {
    val dir = Files.createTempDirectory("epoch_contract_").toFile
    dir.deleteOnExit()
    val t0 = LocalDateTime.of(1969, 12, 30, 10, 0, 0)
    val rows = java.util.Arrays.asList(
      Row(1L, t0, 7L, "purchase", 10.0, null),
      Row(2L, t0.minusMinutes(5), 7L, "click", 1.0, null),
      Row(3L, t0.plusHours(2), 8L, "purchase", 20.0, null),
      Row(4L, t0.plusHours(3), 8L, "click", 2.0, null))
    val staging = new java.io.File(dir, "staging").getAbsolutePath
    spark.createDataFrame(rows, EventsStream.rawSchema)
      .coalesce(1).write.parquet(staging)
    val part = scala.util.Using.resource(
        Files.list(Paths.get(staging)))(
      _.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst.orElseThrow())
    Files.move(part, Paths.get(dir.getAbsolutePath, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.getAbsolutePath
  }

  test("left-outer join on an all-pre-epoch corpus is empty, not an NPE") {
    assert(EventsStream.purchaseClickLeftJoin(spark, preEpochDir).count() === 0L)
  }

  test("inner join and dedup on an all-pre-epoch corpus are empty") {
    assert(EventsStream.purchaseClickJoin(spark, preEpochDir).count() === 0L)
    assert(EventsStream.dedupedCounts(spark, preEpochDir).count() === 0L)
  }
}
