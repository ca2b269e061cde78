package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Crash-injection specs for the claimed-atomic dances (round-11 verdict
  * item 6). A "crash" is simulated by CONSTRUCTING the exact filesystem /
  * table state a kill between two phases leaves behind, then asserting
  * the restart invariants: no state loses BOTH the old and the new data,
  * and a re-run completes cleanly from every intermediate state.
  *
  * moveTo's replace dance (`io/FileLifecycle.scala`) has three phases per
  * file: (1) delete any stale `.graft-replacing` aside, (2) rename the
  * existing dest ASIDE, (3) move src in, (4) drop the aside. The
  * intermediate states after (2) and after (3) are the interesting ones.
  */
class CrashInjectionSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, content)
    p.toString
  }

  private def readStr(dir: String, name: String): String =
    Files.readString(Paths.get(dir, name))

  test("moveTo restart after a crash between aside-rename and src-move") {
    // state: dest renamed aside (old content lives ONLY in the aside),
    // src never moved — the batch died mid-dance
    val src = tmp("crash_src"); val dst = tmp("crash_dst")
    write(dst, "f.csv.graft-replacing", "OLD")
    val srcFile = write(src, "f.csv", "NEW")
    // invariant 1: the old data is still recoverable under destDir
    assert(readStr(dst, "f.csv.graft-replacing") == "OLD")
    // invariant 2: re-running the move completes — new content lands,
    // the stale aside is cleaned (phase 1), nothing half-replaced remains
    FileLifecycle.moveTo(Seq(srcFile), dst)
    assert(readStr(dst, "f.csv") == "NEW")
    assert(!Files.exists(Paths.get(dst, "f.csv.graft-replacing")))
    assert(!Files.exists(Paths.get(src, "f.csv")))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("moveTo restart after a crash between src-move and aside-delete") {
    // state: new file moved in, the old file's aside never dropped
    val src = tmp("crash_src2"); val dst = tmp("crash_dst2")
    write(dst, "f.csv", "NEW")
    write(dst, "f.csv.graft-replacing", "OLD")
    // invariant 1: consumers never see the aside as an archive entry
    val listed = FileLifecycle.list(dst)
    assert(listed.exists(_.endsWith("f.csv")))
    assert(!listed.exists(_.endsWith(".graft-replacing")))
    // invariant 2: the NEXT replace of the same name cleans the stale
    // aside, protects the current dest through its own aside, and lands
    val srcFile = write(src, "f.csv", "NEWER")
    FileLifecycle.moveTo(Seq(srcFile), dst)
    assert(readStr(dst, "f.csv") == "NEWER")
    assert(!Files.exists(Paths.get(dst, "f.csv.graft-replacing")))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("moveTo batch killed mid-batch: completed files stay, the rest re-run") {
    // state: file a moved, file b untouched (kill between loop iterations)
    val src = tmp("crash_src3"); val dst = tmp("crash_dst3")
    write(dst, "a.csv", "A")                    // already archived
    val b = write(src, "b.csv", "B")            // still pending
    // restart re-lists the source and moves only what remains — the
    // archived half of the batch is untouched
    val pending = FileLifecycle.list(src, ".csv")
    assert(pending.size == 1 && pending.head.endsWith("b.csv"))
    FileLifecycle.moveTo(Seq(b), dst)
    assert(readStr(dst, "a.csv") == "A" && readStr(dst, "b.csv") == "B")
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("staging ledger: a run killed after markActive is visible to the restart pre-flight") {
    import java.sql.Timestamp
    import graft.meta.Staging
    val ledger = tmp("crash_ledger") + "/ledger"
    val run1 = new Staging(spark, ledger)
    run1.markActive("b1", Seq("k.csv"), Timestamp.valueOf("2026-01-01 00:00:00"))
    // the process dies here — markInactive never runs. A FRESH instance
    // (the restart) must see the evidence through nothing but the ledger.
    val restart = new Staging(spark, ledger)
    assert(restart.activeFiles() === Seq("k.csv"))
    // the restart reprocesses and completes; the append-only ledger makes
    // the recovery a plain append, no repair step
    restart.markInactive("b1", Seq("k.csv"), Timestamp.valueOf("2026-01-01 01:00:00"))
    assert(restart.activeFiles().isEmpty)
    assert(new Staging(spark, ledger).activeFiles().isEmpty)
  }

  test("jdbc staging: a crash between the migration ALTER and the first append") {
    import java.sql.Timestamp
    import graft.meta.JdbcStaging
    val url = "jdbc:derby:memory:graftcrashmig;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // legacy table; the dying run issued the ALTER but never appended
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st0 = conn.createStatement()
      st0.executeUpdate(
        """CREATE TABLE mig_staging (
          |  batchId VARCHAR(64), fileName VARCHAR(256), status VARCHAR(1),
          |  updatedAt TIMESTAMP, seq BIGINT)""".stripMargin)
      st0.executeUpdate(
        "INSERT INTO mig_staging VALUES ('b0', 'old.csv', 'A', '2026-01-01 00:00:00', 1)")
      st0.executeUpdate("ALTER TABLE mig_staging ADD COLUMN writer VARCHAR(36)")
      st0.close()
    } finally conn.close()
    // the restart instance must NOT re-issue the ALTER ("column already
    // exists" on every append) and must read the legacy row's null writer
    // under the documented ordering
    val restart = new JdbcStaging(spark, url, "mig_staging", props)
    assert(restart.activeFiles() === Seq("old.csv"))
    restart.markInactive("b0", Seq("old.csv"), Timestamp.valueOf("2026-01-01 01:00:00"))
    assert(restart.activeFiles().isEmpty)
  }
}
