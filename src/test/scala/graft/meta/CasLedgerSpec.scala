package graft.meta

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The CAS-based ledger protocol for non-atomic-rename object stores
  * (r14 verdict item 8): every guarantee the rename-based [[GenLedger]]
  * derives from rename atomicity, re-proven over [[ConditionalStore]]'s
  * two compare-and-swap shapes — with REAL racing threads through the
  * in-memory double, not sequential simulations.
  */
class CasLedgerSpec extends AnyFunSuite {

  private def ops(store: ConditionalStore, id: String,
      staleMs: Long = 60000L): CasLedgerOps =
    new CasLedgerOps(store, "s3://bucket/store", id, staleMs)

  test("two live acquirers: exactly one wins, the loser is told who holds it") {
    val store = new ConditionalStore.InMemory
    val a = ops(store, "writer-a"); val b = ops(store, "writer-b")
    a.acquire()
    val e = intercept[GenLedger.ConcurrentWriterException] { b.acquire() }
    assert(e.getMessage.contains("writer-a"))
    a.release()
    b.acquire() // and the release really frees it
    b.release()
  }

  test("N threads racing a STALE lock: exactly one reclaims it") {
    val store = new ConditionalStore.InMemory
    val dead = ops(store, "crashed-writer", staleMs = 1000L)
    dead.acquire()
    store.ageBack("s3://bucket/store/_lock", 5000L) // heartbeats stopped 5 s ago
    val n = 8
    val ready = new CountDownLatch(n); val go = new CountDownLatch(1)
    val wins = new AtomicInteger(0); val losses = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(n)
    (1 to n).foreach { i =>
      pool.execute { () =>
        val w = ops(store, s"reclaimer-$i", staleMs = 1000L)
        ready.countDown(); go.await()
        try { w.acquire(); wins.incrementAndGet() }
        catch { case _: GenLedger.ConcurrentWriterException => losses.incrementAndGet() }
      }
    }
    ready.await(); go.countDown()
    pool.shutdown(); assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() === 1, s"one-winner arbitration: wins=${wins.get()}")
    assert(losses.get() === n - 1)
  }

  test("fencing: a poached writer's publish refuses BEFORE the marker exists") {
    val store = new ConditionalStore.InMemory
    val a = ops(store, "writer-a", staleMs = 1000L)
    a.acquire()
    // a's heartbeats stall; a reclaimer takes over (delete+put rotates the
    // etag, so a's fencing token is dead)
    store.ageBack("s3://bucket/store/_lock", 5000L)
    val b = ops(store, "writer-b", staleMs = 1000L)
    b.acquire()
    val e = intercept[GenLedger.ConcurrentWriterException] { a.publish(0, Seq("k0")) }
    assert(e.getMessage.contains("fencing token"))
    assert(a.committedGens().isEmpty, "the fenced publish must leave nothing visible")
    // the new holder publishes the same generation number cleanly
    b.publish(0, Seq("k0-b"))
    assert(b.committedGens() === Seq(0))
    assert(b.keysOf(0) === Seq("k0-b"))
    // and a's release must not free b's lease
    a.release()
    val c = ops(store, "writer-c")
    intercept[GenLedger.ConcurrentWriterException] { c.acquire() }
    b.release()
  }

  test("heartbeats rotate the token: a reclaimer holding a stale etag loses its CAS") {
    val store = new ConditionalStore.InMemory
    val a = ops(store, "writer-a")
    a.acquire()
    val observed = store.get("s3://bucket/store/_lock").get._2 // reclaimer's snapshot
    assert(a.heartbeat(), "a live holder's beat must succeed")
    assert(!store.deleteIfMatch("s3://bucket/store/_lock", observed),
      "a beat between observe and CAS must defeat the reclaim — that is the point")
    a.release()
  }

  test("duplicate generation publish is refused by if-absent (no latest-wins overwrite)") {
    val store = new ConditionalStore.InMemory
    val a = ops(store, "writer-a")
    a.acquire(); a.publish(3, Seq("k3")); a.release()
    val b = ops(store, "writer-b")
    b.acquire()
    val e = intercept[GenLedger.ConcurrentWriterException] { b.publish(3, Seq("other")) }
    assert(e.getMessage.contains("already committed"))
    assert(b.keysOf(3) === Seq("k3"), "the original marker must be untouched")
    b.release()
  }

  test("publish without the lease refuses") {
    val store = new ConditionalStore.InMemory
    intercept[GenLedger.ConcurrentWriterException] {
      ops(store, "writer-a").publish(0, Nil)
    }
  }
}
