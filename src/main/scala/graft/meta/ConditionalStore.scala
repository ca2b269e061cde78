package graft.meta

import java.util.concurrent.atomic.AtomicLong

/** The minimal object-store surface the ledger protocol needs on a store
  * WITHOUT atomic rename (plain S3 and friends): single-object PUTs are
  * all-or-nothing, and writes can be CONDITIONAL on the object's current
  * state (S3 `If-None-Match: *` / `If-Match: <etag>`, GCS
  * `x-goog-if-generation-match`, ABFS etag preconditions). Everything
  * [[GenLedger]] gets from rename atomicity — torn-marker invisibility,
  * one-winner lock claims, reclaim arbitration — is re-derivable from
  * these two compare-and-swap shapes, which is what [[CasLedgerOps]] does.
  *
  * No live object store exists in this environment (zero egress), so the
  * only production implementation would be a thin adapter over a cloud
  * SDK; [[ConditionalStore.InMemory]] below is the protocol test double
  * (CasLedgerSpec races real threads through it).
  */
private[graft] trait ConditionalStore {

  /** All-or-nothing PUT iff the key does not exist. Returns false (HTTP
    * 412) when it does — the arbiter for lock acquisition and duplicate
    * generation publishes.
    */
  def putIfAbsent(key: String, content: Array[Byte]): Option[String]

  /** All-or-nothing PUT iff the key exists with exactly `etag`. Returns
    * the NEW etag on success, None on mismatch (or absence) — the
    * heartbeat / fencing primitive.
    */
  def putIfMatch(key: String, etag: String, content: Array[Byte]): Option[String]

  /** DELETE iff the key exists with exactly `etag` — the one-winner
    * reclaim arbiter (two reclaimers CAS on the same observed etag; the
    * store accepts exactly one).
    */
  def deleteIfMatch(key: String, etag: String): Boolean

  /** (content, etag, last-modified millis), or None when absent. */
  def get(key: String): Option[(Array[Byte], String, Long)]

  /** Keys under `prefix`, unordered. */
  def list(prefix: String): Seq[String]

  /** Unconditional all-or-nothing PUT (create or replace), returning the
    * new etag. Plain `PUT` exists on every object store; the ledger uses
    * it only where last-writer-wins is the DESIRED semantics (kind
    * markers, the seal) — never for commits or the lease.
    */
  def put(key: String, content: Array[Byte]): String

  /** Unconditional DELETE; false when the key was already absent. Used
    * only for sweeping markers that are superseded by protocol (below a
    * committed compaction) — arbitration never rides on it.
    */
  def delete(key: String): Boolean
}

private[graft] object ConditionalStore {

  /** Thread-safe in-memory double with real etag semantics: every
    * successful write mints a fresh etag, and the conditional operations
    * are atomic under the store's lock — the same guarantees the cloud
    * stores document, and nothing more (in particular: NO rename, and no
    * multi-key atomicity).
    */
  final class InMemory extends ConditionalStore {
    private val seq = new AtomicLong(0L)
    private val objects =
      scala.collection.mutable.HashMap[String, (Array[Byte], String, Long)]()

    private def freshTag(): String = s"etag-${seq.incrementAndGet()}"

    override def putIfAbsent(key: String, content: Array[Byte]): Option[String] =
      objects.synchronized {
        if (objects.contains(key)) None
        else {
          val tag = freshTag()
          objects(key) = (content.clone(), tag, System.currentTimeMillis())
          Some(tag)
        }
      }

    override def putIfMatch(key: String, etag: String,
        content: Array[Byte]): Option[String] =
      objects.synchronized {
        objects.get(key) match {
          case Some((_, tag, _)) if tag == etag =>
            val fresh = freshTag()
            objects(key) = (content.clone(), fresh, System.currentTimeMillis())
            Some(fresh)
          case _ => None
        }
      }

    override def deleteIfMatch(key: String, etag: String): Boolean =
      objects.synchronized {
        objects.get(key) match {
          case Some((_, tag, _)) if tag == etag => objects.remove(key); true
          case _ => false
        }
      }

    override def get(key: String): Option[(Array[Byte], String, Long)] =
      objects.synchronized {
        objects.get(key).map { case (c, t, m) => (c.clone(), t, m) }
      }

    override def list(prefix: String): Seq[String] =
      objects.synchronized { objects.keys.filter(_.startsWith(prefix)).toSeq }

    override def put(key: String, content: Array[Byte]): String =
      objects.synchronized {
        val tag = freshTag()
        objects(key) = (content.clone(), tag, System.currentTimeMillis())
        tag
      }

    override def delete(key: String): Boolean =
      objects.synchronized { objects.remove(key).isDefined }

    /** Test hook: age an object's last-modified back, simulating a writer
      * whose heartbeats stopped `ms` ago.
      */
    def ageBack(key: String, ms: Long): Unit = objects.synchronized {
      objects.get(key).foreach { case (c, t, m) => objects(key) = (c, t, m - ms) }
    }
  }
}
