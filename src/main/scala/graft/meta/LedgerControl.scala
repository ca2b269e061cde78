package graft.meta

/** The generation ledger's CONTROL PLANE — the marker, lease, and seal
  * primitives whose atomicity the whole store protocol rides on —
  * extracted behind a trait so [[GenLedger]] can run on two kinds of
  * storage without forking the protocol:
  *
  *  - [[RenameControl]]: HDFS / local / any FS with atomic single-object
  *    rename. Marker publish = tmp + rename; lease = create-if-absent
  *    file with mtime heartbeats; stale takeover = rename-aside
  *    arbitration. This is the default and the only backend the benches
  *    and the oracle sweep exercise.
  *  - [[CasLedgerOps]]: object stores WITHOUT atomic rename (plain S3,
  *    GCS, ABFS) via [[ConditionalStore]]'s conditional-put surface.
  *    Marker publish = put-if-absent; lease = put-if-absent with an
  *    etag-rotating heartbeat that doubles as a TRUE fencing token.
  *
  * The DATA plane (parquet generation directories, `_config`, the file
  * census) stays on the Hadoop [[org.apache.hadoop.fs.FileSystem]] in
  * both worlds — parquet on s3a works fine; it is only the ledger's
  * commit points and arbitration that must not assume rename atomicity.
  *
  * Backends are resolved per root by [[GenLedger.controlFor]]: a prefix
  * registered via [[GenLedger.registerCasBackend]] routes that root's
  * control plane through CAS; everything else uses rename. Production
  * wiring for a real bucket is a thin [[ConditionalStore]] adapter over
  * the cloud SDK (S3 `If-None-Match:*` / `If-Match`, GCS
  * `x-goog-if-generation-match`, ABFS etag preconditions) registered for
  * the bucket's URI prefix.
  */
private[graft] trait LedgerControl {
  import LedgerControl.Kind

  // ---- writer lease ----
  /** Acquire the exclusive writer lease; throws
    * [[GenLedger.ConcurrentWriterException]] against a LIVE holder; a
    * stale one (no heartbeat for the staleness window) is arbitrated to
    * exactly one reclaimer.
    */
  def acquire(): Unit

  /** One heartbeat — re-asserts liveness (and, where the backend
    * supports it, ownership). Never throws: a failed beat is retried at
    * the next tick, and a genuinely lost lease is caught by [[fence]].
    */
  def beat(): Unit

  /** The commit-time fence: abort (throw) unless this control still
    * holds the lease it acquired — called immediately before anything
    * becomes visible (kind markers, the commit publish, the sweep).
    * `action` names the step for the error message.
    */
  def fence(action: String): Unit

  /** Release only OUR lease: a poached lock is left to its new holder. */
  def release(): Unit

  // ---- markers ----
  /** Generations carrying a marker of `kind`, ascending. */
  def listGens(kind: Kind): Seq[Int]

  /** The idempotency keys recorded in `gen`'s commit marker. */
  def keysOf(gen: Int): Seq[String]

  /** Fenced, atomic publish of `gen`'s commit marker carrying `keys`:
    * marker existence and content become visible together, and nothing
    * becomes visible if the lease was lost.
    */
  def publish(gen: Int, keys: Iterable[String]): Unit

  /** Write the `kind` marker for `gen` (idempotent — a crashed earlier
    * attempt at the same generation may have left one; content is
    * irrelevant, existence is the record).
    */
  def putKind(kind: Kind, gen: Int): Unit

  /** Remove `gen`'s marker of `kind` if present (orphan clearing and the
    * superseded-generation sweep — never an arbitration step).
    */
  def dropMarker(kind: Kind, gen: Int): Unit

  // ---- seal ----
  /** Permanently refuse further mutations on this root (see
    * [[GenLedger.seal]]); last-writer-wins by design.
    */
  def seal(reason: String): Unit

  def sealedReason(): Option[String]
}

private[graft] object LedgerControl {

  /** The three marker kinds, with the directory/prefix each lives under. */
  sealed abstract class Kind(val dirName: String)
  case object Commit extends Kind("_commits")
  case object Tombstone extends Kind("_tombstones")
  case object Compaction extends Kind("_compactions")
}

/** The rename-atomicity control plane — the ledger's original protocol,
  * moved here verbatim when the trait was extracted (r15; the behavior
  * GenLedgerSpec, LeaseStress, and the `lease_stress` matrix cell pin):
  *
  *  - marker publish: write a `tmp_`-prefixed sibling (invisible to the
  *    `gen=` scan), rename into place — atomic on HDFS and local FS;
  *  - lease acquire: create-if-absent `_lock` (POSIX O_CREAT|O_EXCL on
  *    the local scheme — Hadoop's ChecksumFileSystem implements
  *    `create(overwrite=false)` as exists-then-create, a TOCTOU
  *    tools/LeaseStress hit in practice, r14);
  *  - heartbeat: mtime refresh; staleness = mtime age;
  *  - stale takeover: rename the lock aside — exactly one of N racing
  *    reclaimers' renames succeeds;
  *  - fence: re-read the lock's holder id immediately before anything
  *    becomes visible.
  */
private[graft] final class RenameControl(spark: org.apache.spark.sql.SparkSession,
    root: String, holderId: String, staleMs: () => Long) extends LedgerControl {
  import java.io.{FileNotFoundException, IOException}
  import org.apache.hadoop.fs.{FileSystem, Path}
  import LedgerControl.Kind

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def lockPath = new Path(root, "_lock")
  private def sealedPath = new Path(root, "_sealed")
  private def kindDir(kind: Kind) = new Path(root, kind.dirName)
  private def markerPath(kind: Kind, gen: Int) = new Path(kindDir(kind), s"gen=$gen")
  private def commitDir = kindDir(LedgerControl.Commit)

  // ---- markers -------------------------------------------------------------

  override def listGens(kind: Kind): Seq[Int] = {
    val dir = kindDir(kind)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
      .sorted
  }

  override def keysOf(gen: Int): Seq[String] = {
    val in = fs.open(markerPath(LedgerControl.Commit, gen))
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Atomically publish `gen` as committed with `keys` recorded: write a
    * tmp sibling (its `tmp_` name never matches the `gen=` scan), then
    * rename into place. Fenced — see [[fence]].
    */
  override def publish(gen: Int, keys: Iterable[String]): Unit = {
    fence(s"publishing gen=$gen")
    fs.mkdirs(commitDir)
    val tmp = new Path(commitDir, s"tmp_gen=$gen")
    val out = fs.create(tmp, true)
    try out.write(keys.mkString("\n").getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, markerPath(LedgerControl.Commit, gen)),
      s"could not publish commit marker for gen=$gen at $root")
  }

  override def putKind(kind: Kind, gen: Int): Unit = {
    fs.mkdirs(kindDir(kind))
    fs.create(markerPath(kind, gen), true).close()
  }

  override def dropMarker(kind: Kind, gen: Int): Unit = {
    fs.delete(markerPath(kind, gen), false)
    ()
  }

  // ---- seal ----------------------------------------------------------------

  override def seal(reason: String): Unit = {
    val out = fs.create(sealedPath, true)
    try out.write(reason.getBytes("UTF-8")) finally out.close()
  }

  override def sealedReason(): Option[String] =
    if (!fs.exists(sealedPath)) None
    else Some {
      try {
        val in = fs.open(sealedPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } catch { case _: IOException => "<sealed (reason unreadable)>" }
    }

  // ---- writer lease --------------------------------------------------------

  /** Atomic create-if-absent. On HDFS `fs.create(path, overwrite=false)`
    * is namenode-atomic, but Hadoop's LOCAL filesystem implements it as
    * exists-then-create — a TOCTOU window two same-box writers hit in
    * practice (found by tools/LeaseStress: both racers "acquired", both
    * minted gen=0, and their committers ate each other's `_temporary`
    * dirs — the exact corruption the lease exists to prevent). For the
    * `file` scheme, acquire through POSIX O_CREAT|O_EXCL
    * (`File.createNewFile`), which the kernel arbitrates; content is
    * written after the atomic claim (no reader races it: only the owner
    * writes, and `lockHolder()` tolerates a mid-write read by failing
    * closed to "held by unknown").
    */
  private def tryCreateLock(): Boolean =
    if (fs.getScheme == "file") {
      val f = new java.io.File(lockPath.toUri.getPath)
      f.getParentFile.mkdirs()
      val claimed = try f.createNewFile() catch { case _: IOException => false }
      if (claimed)
        // holder-id write failing AFTER the atomic claim (disk full, kill)
        // would otherwise orphan an empty lock that blocks every writer for
        // staleMs (ADVICE r14) — release the claim before propagating
        try java.nio.file.Files.write(f.toPath, holderId.getBytes("UTF-8"))
        catch { case e: Throwable => f.delete(); throw e }
      claimed
    } else {
      val created =
        try Some(fs.create(lockPath, false))
        catch { case _: IOException => None } // exists (or raced) — not held by us
      created match {
        case None => false
        case Some(out) =>
          // same orphan hazard as the local branch: a failure between the
          // successful create and the holder-id close must not leave an
          // empty lock nobody holds — best-effort delete, then propagate
          try { try out.write(holderId.getBytes("UTF-8")) finally out.close(); true }
          catch {
            case e: Throwable =>
              try fs.delete(lockPath, false) catch { case _: IOException => () }
              throw e
          }
      }
    }

  private def lockHolder(): String =
    try {
      val in = fs.open(lockPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } catch { case _: IOException => "<unreadable>" }

  override def acquire(): Unit = {
    if (tryCreateLock()) return
    val status = try Some(fs.getFileStatus(lockPath))
      catch { case _: FileNotFoundException => None }
    status match {
      case None =>
        // released between our create and the stat — one clean retry; a
        // loss here is a genuinely concurrent acquirer, which is the error
        if (!tryCreateLock())
          throw new GenLedger.ConcurrentWriterException(
            s"store at $root: writer lock contended (held by ${lockHolder()})")
      case Some(st) =>
        val age = System.currentTimeMillis() - st.getModificationTime
        if (age <= staleMs())
          throw new GenLedger.ConcurrentWriterException(
            s"store at $root is locked by another writer [${lockHolder()}], " +
              s"heartbeat ${age} ms ago (stale after ${staleMs()} ms) — stores are " +
              s"single-writer; stop the other mutation (e.g. an ingest stream) first")
        // stale: CLAIM by rename — exactly one of N racing reclaimers wins
        val claim = new Path(root, s"tmp_lock_reclaim_${java.util.UUID.randomUUID()}")
        if (fs.rename(lockPath, claim)) fs.delete(claim, false)
        if (!tryCreateLock())
          throw new GenLedger.ConcurrentWriterException(
            s"store at $root: lost the race for a stale writer lock to " +
              s"[${lockHolder()}] — retry when it releases")
    }
  }

  override def beat(): Unit =
    try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
    catch { case _: IOException => () } // next beat retries; staleMs >> period

  /** The commit-time fence: abort unless this control still holds the
    * lease it acquired in the enclosing `withWriterLock`. A missing or
    * unreadable lock fails closed — if we were poached and the poacher
    * already finished and released, our lease is just as gone.
    */
  override def fence(action: String): Unit = {
    val h = lockHolder()
    if (h != holderId)
      throw new GenLedger.ConcurrentWriterException(
        s"store at $root: writer lease lost while $action — the lock now " +
          s"reads [$h], not this writer [$holderId] (heartbeats stalled past " +
          s"the ${staleMs()} ms staleness window and the lease was reclaimed); " +
          "aborting the publish — the mutation's data files stay uncommitted")
  }

  override def release(): Unit = {
    // release only OUR lock: if a pathological heartbeat outage let a
    // reclaimer poach it mid-run, deleting here would free THEIR lease too
    if (lockHolder() == holderId) fs.delete(lockPath, false)
    ()
  }
}
