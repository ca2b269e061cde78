package graft.meta

/** The [[GenLedger]] marker + writer-lease protocol re-derived for stores
  * WITHOUT atomic rename (r14 verdict item 8 — "the one assumption that
  * breaks on plain S3"), over [[ConditionalStore]]'s two CAS shapes.
  * Mapping, primitive by primitive:
  *
  *  - '''marker publish''' (was: write `tmp_gen=N`, rename into place):
  *    a single `putIfAbsent(_commits/gen=N, keys)`. One object PUT is
  *    all-or-nothing on every real object store, so the torn-marker
  *    window rename closed does not exist here at all — and the
  *    if-absent condition additionally refuses a DUPLICATE publish of
  *    the same generation outright, which the rename protocol could only
  *    catch via the lease fence.
  *
  *  - '''lock acquire''' (was: `fs.create(_lock, overwrite=false)` /
  *    POSIX O_CREAT|O_EXCL): `putIfAbsent(_lock, holderId)`. The store
  *    arbitrates; the returned etag becomes this holder's FENCING TOKEN.
  *
  *  - '''heartbeat''' (was: mtime refresh): `putIfMatch(_lock, myEtag,
  *    holderId)` — each beat re-asserts ownership and rotates the token,
  *    so a reclaimer that observed any earlier etag loses its CAS.
  *
  *  - '''stale takeover''' (was: rename the lock aside — exactly one of N
  *    renames succeeds): read (etag, age); if stale,
  *    `deleteIfMatch(_lock, etag)` then re-acquire. The CAS delete is the
  *    one-winner arbiter: every racing reclaimer conditions on the same
  *    observed etag and the store accepts exactly one.
  *
  *  - '''commit fence''' (was: re-read the lock's holder id before the
  *    publish rename): the publish happens ONLY when `putIfMatch` on the
  *    lock with the holder's current token still succeeds — a poached
  *    writer's token is gone (the reclaimer's delete+put rotated it), so
  *    its publish refuses BEFORE the marker exists. Token-based fencing
  *    is strictly stronger than the id re-read: it cannot be confused by
  *    an ABA holder (crash, reclaim, re-acquire by a same-named process).
  *
  * This module is the PROTOCOL, kept deliberately free of Spark and
  * Hadoop types so CasLedgerSpec can race real threads through the
  * in-memory double. It is WIRED (r15): it implements [[LedgerControl]],
  * so a [[GenLedger]] whose root matches a prefix registered via
  * [[GenLedger.registerCasBackend]] runs its entire control plane —
  * every store mutation, fold, vacuum, seal, and the ingest streams'
  * exactly-once keys — through these CAS ops instead of rename
  * (CasStoreEndToEndSpec drives both stores' full lifecycles this way).
  * Production use is a thin [[ConditionalStore]] adapter over a cloud
  * SDK; no live object store exists in this environment, so rename
  * remains the default backend (HDFS and local rename ARE atomic).
  */
private[graft] final class CasLedgerOps(store: ConditionalStore, root: String,
    holderId: String, staleMs: Long) extends LedgerControl {

  private def lockKey = s"$root/_lock"
  private def markerKey(gen: Int) = s"$root/_commits/gen=$gen"
  private def kindKey(kind: LedgerControl.Kind, gen: Int) =
    s"$root/${kind.dirName}/gen=$gen"

  /** This holder's current fencing token — rotated by every heartbeat;
    * None while the lease is not held.
    */
  @volatile private var token: Option[String] = None

  def heldToken: Option[String] = token

  /** Acquire the exclusive writer lease, taking over a stale one (no
    * heartbeat for `staleMs`). Throws [[GenLedger.ConcurrentWriterException]]
    * against a LIVE holder, exactly like the rename-based ledger.
    */
  def acquire(): Unit = {
    store.putIfAbsent(lockKey, holderId.getBytes("UTF-8")) match {
      case Some(tag) => token = Some(tag)
      case None =>
        store.get(lockKey) match {
          case None =>
            // released between our put and the get — one clean retry
            token = Some(store.putIfAbsent(lockKey, holderId.getBytes("UTF-8"))
              .getOrElse(throw new GenLedger.ConcurrentWriterException(
                s"cas-ledger at $root: writer lock contended")))
          case Some((held, etag, mtime)) =>
            val age = System.currentTimeMillis() - mtime
            if (age <= staleMs)
              throw new GenLedger.ConcurrentWriterException(
                s"cas-ledger at $root is locked by [${new String(held, "UTF-8")}], " +
                  s"heartbeat $age ms ago (stale after $staleMs ms)")
            // stale: the CAS delete on the OBSERVED etag is the one-winner
            // arbiter among N racing reclaimers
            if (!store.deleteIfMatch(lockKey, etag))
              throw new GenLedger.ConcurrentWriterException(
                s"cas-ledger at $root: lost the race for a stale writer lock")
            token = Some(store.putIfAbsent(lockKey, holderId.getBytes("UTF-8"))
              .getOrElse(throw new GenLedger.ConcurrentWriterException(
                s"cas-ledger at $root: lost the race for a stale writer lock")))
        }
    }
  }

  /** One heartbeat: re-assert ownership, rotating the fencing token.
    * Returns false when the lease was poached (the caller's next commit
    * will refuse; beats never throw, mirroring the rename ledger's
    * swallow-and-retry beats).
    */
  def heartbeat(): Boolean = token match {
    case None => false
    case Some(t) =>
      store.putIfMatch(lockKey, t, holderId.getBytes("UTF-8")) match {
        case Some(fresh) => token = Some(fresh); true
        case None => false
      }
  }

  /** [[LedgerControl]]'s never-throwing beat — a lost lease surfaces at
    * the next [[fence]], exactly like the rename backend's swallowed
    * `setTimes` beats.
    */
  override def beat(): Unit = { heartbeat(); () }

  /** The commit-time fence as a token CAS: re-asserting ownership IS a
    * conditional put on our current etag, so a poached writer (token
    * rotated by a reclaimer's delete+put) fails here — BEFORE anything
    * becomes visible. Strictly stronger than the rename backend's
    * holder-id re-read: an ABA holder (crash, reclaim, re-acquire by a
    * same-named process) passes the id check but cannot forge the etag.
    */
  override def fence(action: String): Unit = {
    val t = token.getOrElse(throw new GenLedger.ConcurrentWriterException(
      s"cas-ledger at $root: $action without the lease"))
    store.putIfMatch(lockKey, t, holderId.getBytes("UTF-8")) match {
      case Some(fresh) => token = Some(fresh)
      case None =>
        throw new GenLedger.ConcurrentWriterException(
          s"cas-ledger at $root: writer lease lost while $action " +
            "(fencing token rotated by a reclaimer) — aborting; nothing " +
            "became visible")
    }
  }

  /** Publish generation `gen` carrying `keys`, FENCED on the current
    * token: the lock must still carry this holder's etag at publish time,
    * and the marker itself must not already exist. Either failure aborts
    * before anything becomes visible.
    */
  def publish(gen: Int, keys: Iterable[String]): Unit = {
    fence(s"publishing gen=$gen")
    if (store.putIfAbsent(markerKey(gen), keys.mkString("\n").getBytes("UTF-8")).isEmpty)
      throw new GenLedger.ConcurrentWriterException(
        s"cas-ledger at $root: gen=$gen is already committed — a concurrent " +
          "writer published it (duplicate generation refused by if-absent)")
  }

  /** Release only OUR lease: a poached lock (token rotated) is left for
    * its new holder, same as the rename ledger's holder-checked delete.
    */
  def release(): Unit = {
    token.foreach(t => store.deleteIfMatch(lockKey, t))
    token = None
  }

  /** Committed generations, ascending. */
  def committedGens(): Seq[Int] = listGens(LedgerControl.Commit)

  override def listGens(kind: LedgerControl.Kind): Seq[Int] =
    store.list(s"$root/${kind.dirName}/gen=")
      .map(_.split("gen=").last.toInt).sorted

  def keysOf(gen: Int): Seq[String] =
    store.get(markerKey(gen)).toSeq.flatMap { case (c, _, _) =>
      new String(c, "UTF-8").split("\n").iterator.map(_.trim).filter(_.nonEmpty)
    }

  /** Kind markers are existence-records with irrelevant content; a
    * leftover from a crashed same-generation attempt is the same record,
    * so "already exists" is success, not contention (the FENCED commit
    * publish is where poached writers are refused).
    */
  override def putKind(kind: LedgerControl.Kind, gen: Int): Unit = {
    store.putIfAbsent(kindKey(kind, gen), Array.emptyByteArray)
    ()
  }

  override def dropMarker(kind: LedgerControl.Kind, gen: Int): Unit = {
    store.delete(kindKey(kind, gen))
    ()
  }

  /** Last-writer-wins by design (a re-seal just refreshes the reason) —
    * a plain PUT, like the rename backend's overwrite-create.
    */
  override def seal(reason: String): Unit = {
    store.put(s"$root/_sealed", reason.getBytes("UTF-8"))
    ()
  }

  override def sealedReason(): Option[String] =
    store.get(s"$root/_sealed").map { case (c, _, _) => new String(c, "UTF-8").trim }
}
