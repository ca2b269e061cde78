package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Non-relational file-lifecycle operators (SURVEY.md §2.13, D1–D7).
  *
  * The reference drives these against S3 with boto3
  * (src/main/read/aws_read.py, download/…, upload/…, move/…, delete/…); in
  * this engine they are expressed against a generic filesystem path — the
  * same calls work over local fs in the sandbox and over an object-store
  * mount/HDFS-compatible FS on a cluster. Driver-side control flow only;
  * no Spark jobs.
  */
object FileLifecycle {

  /** D1: list files under a prefix (recursively), skipping directories. */
  def list(dir: String, suffix: String = ""): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Seq.empty
    else Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(_.toString)
      .filter(_.endsWith(suffix))
      .toSeq.sorted
  }

  /** D2/D3: copy a set of files into a destination directory. */
  def copyTo(files: Seq[String], destDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(destDir))
    files.map { f =>
      val dest = Paths.get(destDir, Paths.get(f).getFileName.toString)
      Files.copy(Paths.get(f), dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toString
    }
  }

  /** D3 (versioned upload): copy under a `{destDir}/{version}/` prefix,
    * mirroring the reference's epoch-millis versioning (main.py:372-373).
    */
  def copyVersioned(files: Seq[String], destDir: String, version: String): Seq[String] =
    copyTo(files, s"$destDir/$version")

  /** D4/D7: move files into a directory (quarantine / archive). */
  def moveTo(files: Seq[String], destDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(destDir))
    files.map { f =>
      val dest = Paths.get(destDir, Paths.get(f).getFileName.toString)
      Files.move(Paths.get(f), dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toString
    }
  }

  /** D5/D6: delete files; deleteDir removes a tree. */
  def delete(files: Seq[String]): Unit =
    files.foreach(f => Files.deleteIfExists(Paths.get(f)))

  def deleteDir(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
  }
}
