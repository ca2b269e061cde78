package graft.meta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The generation-ledger protocol shared by the persisted stores
  * ([[graft.ops.IncrementalDedup.SignatureStore]] and
  * [[graft.ops.IVFStore.Store]]): commit markers written LAST, kind
  * markers (tombstone/compaction) written just before them, latest
  * committed compaction superseding everything below it, and idempotency
  * keys stored INSIDE the commit marker. Extracted so the crash-safety
  * dance is single-sourced — before this, the two stores carried
  * byte-identical copies of six ledger methods, and a fix landing in one
  * (the empty-write guard, the marker-atomicity fix below) could silently
  * miss the other.
  *
  * == Marker atomicity ==
  *
  * A marker's existence IS the commit, and its content IS the applied-key
  * record, so the two must become visible together. A bare
  * `fs.create(marker); write(keys); close()` has a tear window: a crash
  * between create and close leaves an EMPTY visible marker — the
  * generation reads as committed but its idempotency key is lost, and a
  * streaming replay would re-append the batch as a duplicate generation.
  * [[commitMarker]] therefore writes to a `tmp_`-prefixed sibling
  * (invisible to [[markerGens]]) and renames into place — atomic on the
  * filesystems this targets (HDFS, local; object stores with atomic
  * rename semantics for single objects).
  *
  * Layout under `root`:
  * {{{
  *   _commits/gen=N       committed generations (content: idempotency keys)
  *   _tombstones/gen=N    kind marker: gen N is a DELETE
  *   _compactions/gen=N   kind marker: gen N is a compaction fold
  * }}}
  */
private[graft] final class GenLedger(spark: SparkSession, root: String) {

  def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def commitDir = new Path(root, "_commits")
  private def tombstoneDir = new Path(root, "_tombstones")
  private def compactionDir = new Path(root, "_compactions")
  def marker(gen: Int): Path = new Path(commitDir, s"gen=$gen")
  def tombstoneMarker(gen: Int): Path = new Path(tombstoneDir, s"gen=$gen")
  def compactionMarker(gen: Int): Path = new Path(compactionDir, s"gen=$gen")

  private def markerGens(dir: Path): Seq[Int] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("gen=") => s.stripPrefix("gen=").toInt }
      .sorted
  }

  /** Committed generations, ascending; a committed COMPACTION generation
    * supersedes everything below it — readers drop those generations even
    * if the fold's cleanup was interrupted, so the compaction's commit
    * point is the marker, not the deletions.
    */
  def committedGens(): Seq[Int] = {
    val committed = markerGens(commitDir)
    val floor = markerGens(compactionDir).filter(committed.contains)
      .sorted.lastOption.getOrElse(Int.MinValue)
    committed.filter(_ >= floor)
  }

  /** Committed TOMBSTONE generations, ascending (the kind marker alone is
    * not enough — a torn delete leaves it without a commit marker).
    */
  def deleteGens(): Seq[Int] = {
    val committed = committedGens().toSet
    markerGens(tombstoneDir).filter(committed)
  }

  /** Keys of every idempotent mutation already committed (the commit
    * markers' contents — see the class scaladoc for why key and commit
    * cannot tear apart).
    */
  def appliedKeys(): Set[String] =
    committedGens().flatMap { g =>
      val in = fs.open(marker(g))
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
    }.toSet

  def alreadyApplied(key: Option[String]): Boolean =
    key.exists(appliedKeys().contains)

  /** Atomically publish `gen` as committed with `keys` recorded: write a
    * tmp sibling (its `tmp_` name never matches the `gen=` scan), then
    * rename into place.
    */
  private def commitMarker(gen: Int, keys: Iterable[String]): Unit = {
    fs.mkdirs(commitDir)
    val tmp = new Path(commitDir, s"tmp_gen=$gen")
    val out = fs.create(tmp, true)
    try out.write(keys.mkString("\n").getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, marker(gen)),
      s"could not publish commit marker for gen=$gen at $root")
  }

  /** Commit an APPEND generation: clear kind markers a crashed delete() or
    * compact() at this number may have orphaned (a committed gen carrying
    * one would read as a tombstone / truncate the store), then publish.
    */
  def commitAppend(gen: Int, key: Option[String]): Unit = {
    fs.delete(tombstoneMarker(gen), false)
    fs.delete(compactionMarker(gen), false)
    commitMarker(gen, key.toSeq)
  }

  /** Commit a TOMBSTONE generation: kind marker FIRST, commit marker LAST
    * — a crash between them leaves the generation uncommitted (invisible),
    * never a committed delete whose tombstones are silently missed. Clears
    * an orphaned compaction marker from a crashed compact().
    */
  def commitDelete(gen: Int, key: Option[String]): Unit = {
    fs.delete(compactionMarker(gen), false)
    fs.mkdirs(tombstoneDir)
    fs.create(tombstoneMarker(gen), true).close()
    commitMarker(gen, key.toSeq)
  }

  /** Commit a COMPACTION generation (the fold's commit point — readers
    * then ignore every lower generation) carrying the folded `keys`, then
    * sweep superseded generation directories and markers, including strays
    * a crashed earlier cleanup left behind. The sweep is lazy-safe: a
    * crash mid-sweep re-heals on the next compact.
    */
  def commitCompaction(gen: Int, keys: Iterable[String]): Unit = {
    fs.delete(tombstoneMarker(gen), false)
    fs.mkdirs(compactionDir)
    fs.create(compactionMarker(gen), true).close()
    commitMarker(gen, keys)
    (markerGens(commitDir) ++ markerGens(tombstoneDir) ++
      markerGens(compactionDir)).distinct.filter(_ < gen).foreach { g =>
      fs.delete(new Path(root, s"gen=$g"), true)
      fs.delete(marker(g), false)
      fs.delete(tombstoneMarker(g), false)
      fs.delete(compactionMarker(g), false)
    }
  }
}
