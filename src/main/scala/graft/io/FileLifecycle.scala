package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Non-relational file-lifecycle operators (SURVEY.md §2.13, D1–D7).
  *
  * The reference drives these against S3 with boto3
  * (src/main/read/aws_read.py:5-23, download/aws_file_download.py:6-25,
  * upload/upload_to_s3.py:6-24, move/move_files.py:26-62); here they are
  * expressed against the Hadoop [[FileSystem]] API, so the SAME calls take
  * a bare local path, a `file:///` URI, an `hdfs://` URI, or an `s3a://`
  * URI — the scheme picks the FileSystem implementation, and credentials /
  * endpoints come from the active Spark session's Hadoop configuration
  * (where `spark.hadoop.fs.s3a.*` settings land on a real cluster).
  * Driver-side control flow only; no Spark jobs.
  *
  * Paths come back in the same form they went in: bare inputs yield bare
  * outputs (so local callers round-trip cleanly), scheme-qualified inputs
  * yield scheme-qualified outputs.
  */
object FileLifecycle {

  /** Hadoop conf: the active session's (carries `spark.hadoop.*` overrides
    * like s3a credentials) when one exists, else library defaults.
    */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** FileSystem for a path. Checksum wrappers (LocalFileSystem) are
    * UNWRAPPED to their raw fs so copies don't drop `.foo.crc` shadow
    * siblings — mutating the JVM-cached shared instance with
    * `setWriteChecksum(false)` instead would silently disable CRC
    * integrity for every other user of that FileSystem in the process
    * (Spark committers included; review r8). Non-checksum schemes (s3a,
    * hdfs) pass through untouched.
    */
  private def fsFor(p: HPath, conf: Configuration): FileSystem =
    p.getFileSystem(conf) match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
      case fs => fs
    }

  /** Render an output path in the same form as the caller's input: strip the
    * scheme for bare inputs, keep it for qualified ones. The scheme probe
    * goes through [[HPath]], not raw [[URI]] — `new URI("my dir/f")` throws
    * on the space where Hadoop's Path escapes it.
    */
  private def render(p: HPath, likeInput: String): String =
    if (new HPath(likeInput).toUri.getScheme == null) p.toUri.getPath else p.toString

  /** D1: list files under a prefix (recursively), skipping directories and
    * checksum shadow files. Only `.crc` bookkeeping and moveTo's
    * `.graft-replacing` aside files are filtered — a crash-leftover aside
    * is a bookkeeping artifact under a wrong name, not an archive entry a
    * consumer should re-ingest; a blanket dot-prefix skip would make
    * legitimate hidden DATA files silently invisible to the pipeline
    * (neither processed nor quarantined; review r8), which the reference's
    * S3 listing would have returned.
    */
  def list(dir: String, suffix: String = ""): Seq[String] = {
    val conf = hadoopConf
    val root = new HPath(dir)
    val fs = fsFor(root, conf)
    if (!fs.exists(root)) Seq.empty
    else {
      val it = fs.listFiles(root, /* recursive = */ true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.endsWith(".crc") &&
            !name.endsWith(".graft-replacing") && name.endsWith(suffix))
          buf += render(st.getPath, dir)
      }
      buf.result().sorted
    }
  }

  /** D2/D3: copy a set of files into a destination directory (cross-FS ok —
    * e.g. s3a → local download, local → s3a upload).
    */
  def copyTo(files: Seq[String], destDir: String): Seq[String] = {
    val conf = hadoopConf
    val destRoot = new HPath(destDir)
    val destFs = fsFor(destRoot, conf)
    destFs.mkdirs(destRoot)
    files.map { f =>
      val src = new HPath(f)
      val dest = new HPath(destRoot, src.getName)
      FileUtil.copy(fsFor(src, conf), src, destFs, dest,
        /* deleteSource = */ false, /* overwrite = */ true, conf)
      render(dest, destDir)
    }
  }

  /** D3 (versioned upload): copy under a `{destDir}/{version}/` prefix,
    * mirroring the reference's epoch-millis versioning (main.py:372-373).
    */
  def copyVersioned(files: Seq[String], destDir: String, version: String): Seq[String] =
    copyTo(files, s"$destDir/$version")

  /** D4/D7: move files into a directory (quarantine / archive). Same-FS
    * moves are a metadata rename; cross-FS falls back to copy+delete.
    */
  def moveTo(files: Seq[String], destDir: String): Seq[String] = {
    val conf = hadoopConf
    val destRoot = new HPath(destDir)
    val destFs = fsFor(destRoot, conf)
    destFs.mkdirs(destRoot)
    // destinations flatten to basenames while list() walks recursively, so
    // two same-named inputs from different subdirs would archive-REPLACE
    // each other inside one batch — silent data loss (review r9). Loud
    // contract instead: one batch, distinct basenames.
    val dup = files.map(f => new HPath(f).getName)
      .groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    if (dup.nonEmpty)
      throw new java.io.IOException(
        s"moveTo: duplicate basenames would overwrite each other under " +
          s"$destDir: ${dup.mkString(", ")}")
    files.map { f =>
      val src = new HPath(f)
      val srcFs = fsFor(src, conf)
      val dest = new HPath(destRoot, src.getName)
      // REPLACE_EXISTING without a destroy-first window (ADVICE r8: the
      // delete-then-rename form lost the previously archived file if the
      // process died between the two calls). The old dest is renamed ASIDE
      // (metadata-only), the new file moves in, and the aside copy is
      // dropped only after the move succeeds — a crash at any point leaves
      // either the old or the new file recoverable under destDir, at worst
      // plus an `.graft-replacing` leftover cleaned by the next replace of
      // the same name. Hadoop rename signals failure by RETURNING FALSE:
      // an unchecked aside rename would fall through to an overwriting
      // copy and destroy the very file the dance protects (review r9).
      val aside = new HPath(destRoot, src.getName + ".graft-replacing")
      if (destFs.exists(aside)) destFs.delete(aside, false) // stale leftover
      val hadOld = destFs.exists(dest)
      if (hadOld && !destFs.rename(dest, aside))
        throw new java.io.IOException(
          s"moveTo: could not set aside existing $dest (rename returned false)")
      val renamed = srcFs.getUri == destFs.getUri && srcFs.rename(src, dest)
      if (!renamed &&
          !FileUtil.copy(srcFs, src, destFs, dest,
            /* deleteSource = */ true, /* overwrite = */ true, conf))
        throw new java.io.IOException(s"moveTo: copy $src -> $dest failed")
      if (hadOld) destFs.delete(aside, false)
      render(dest, destDir)
    }
  }

  /** D5/D6: delete files; deleteDir removes a tree. */
  def delete(files: Seq[String]): Unit = {
    val conf = hadoopConf
    files.foreach { f =>
      val p = new HPath(f)
      fsFor(p, conf).delete(p, false)
    }
  }

  def deleteDir(dir: String): Unit = {
    val conf = hadoopConf
    val p = new HPath(dir)
    val fs = fsFor(p, conf)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
