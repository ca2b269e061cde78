package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Direct contract tests for the Hadoop-FS file lifecycle (D1–D7) — the
  * pipeline specs exercise the composed flow; these pin the round-8
  * contracts in isolation: paths with spaces survive the scheme probe,
  * hidden DATA files stay visible (only `.crc` shadows filter), and bare
  * vs scheme-qualified inputs round-trip in kind.
  */
class FileLifecycleSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("list/copy/move survive paths containing spaces") {
    val src = tmpDir("lc src ")
    val dst = tmpDir("lc dst ")
    Files.writeString(Paths.get(src, "a file.csv"), "x,y\n1,2\n")
    val listed = FileLifecycle.list(src, ".csv")
    assert(listed.size === 1 && listed.head.endsWith("a file.csv"))
    val copied = FileLifecycle.copyTo(listed, dst)
    assert(copied.size === 1 && Files.exists(Paths.get(copied.head)))
    val moved = FileLifecycle.moveTo(copied, src)
    assert(moved.size === 1 && Files.exists(Paths.get(moved.head)))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("hidden data files are listed; .crc shadows and replace-asides filter out") {
    val dir = tmpDir("lc_hidden")
    Files.writeString(Paths.get(dir, ".hidden_feed.csv"), "a\n1\n")
    Files.writeString(Paths.get(dir, "normal.csv"), "a\n2\n")
    Files.writeString(Paths.get(dir, ".normal.csv.crc"), "junk")
    // a crash-leftover moveTo aside is bookkeeping, not an archive entry
    // (review r9): a consumer re-ingesting the archive must not see it
    Files.writeString(Paths.get(dir, "old.csv.graft-replacing"), "a\n3\n")
    val names = FileLifecycle.list(dir, ".csv").map(p => Paths.get(p).getFileName.toString)
    assert(names.sorted === Seq(".hidden_feed.csv", "normal.csv"))
    assert(!FileLifecycle.list(dir).exists(_.endsWith(".graft-replacing")))
    FileLifecycle.deleteDir(dir)
  }

  test("moveTo rejects duplicate basenames instead of silently replacing") {
    // review r9: list() walks recursively, so a/data.csv and b/data.csv can
    // enter one batch — flattening both onto archive/data.csv would have
    // the second move archive-replace (destroy) the first
    val src = tmpDir("lc_dup")
    val dst = tmpDir("lc_dup_out")
    Files.createDirectories(Paths.get(src, "a"))
    Files.createDirectories(Paths.get(src, "b"))
    Files.writeString(Paths.get(src, "a", "data.csv"), "a\n1\n")
    Files.writeString(Paths.get(src, "b", "data.csv"), "a\n2\n")
    val e = intercept[java.io.IOException](
      FileLifecycle.moveTo(Seq(s"$src/a/data.csv", s"$src/b/data.csv"), dst))
    assert(e.getMessage.contains("duplicate basenames"))
    // neither file moved — the batch failed atomically before any rename
    assert(Files.exists(Paths.get(src, "a", "data.csv")))
    assert(Files.exists(Paths.get(src, "b", "data.csv")))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("bare inputs yield bare outputs; file:// inputs stay qualified") {
    val src = tmpDir("lc_kind")
    val dst = tmpDir("lc_kind_out")
    Files.writeString(Paths.get(src, "k.csv"), "a\n1\n")
    val bare = FileLifecycle.copyTo(Seq(s"$src/k.csv"), dst)
    assert(bare.head === s"$dst/k.csv")
    // Hadoop Path normalizes the empty authority (file:/// -> file:/) —
    // the contract is "scheme-qualified in, scheme-qualified out", not a
    // byte-identical prefix
    val qualified = FileLifecycle.copyTo(Seq(s"file://$src/k.csv"), s"file://$dst")
    assert(qualified.head.startsWith("file:/") && qualified.head.endsWith(s"$dst/k.csv"))
    // local copies through the raw fs leave no .crc shadow siblings
    assert(FileLifecycle.list(dst).forall(!_.endsWith(".crc")))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }

  test("versioned upload lands under the version prefix; delete removes it") {
    val src = tmpDir("lc_ver")
    val dst = tmpDir("lc_ver_out")
    Files.writeString(Paths.get(src, "v.csv"), "a\n1\n")
    val up = FileLifecycle.copyVersioned(Seq(s"$src/v.csv"), dst, "1700000000")
    assert(up.head === s"$dst/1700000000/v.csv" && Files.exists(Paths.get(up.head)))
    FileLifecycle.delete(up)
    assert(!Files.exists(Paths.get(up.head)))
    FileLifecycle.deleteDir(src); FileLifecycle.deleteDir(dst)
  }
}
