package graft.tools

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.GenLedger
import graft.ops.IncrementalDedup

/** Real-race writer-lease stress (r14): GenLedgerSpec proves the lease
  * refuses a SIMULATED foreign lock; this tool proves it arbitrates REAL
  * concurrent writers. Two driver threads race `slices` appends each into
  * ONE store, retrying on `ConcurrentWriterException` (the documented
  * client behavior for a transiently held lease). Gates (exit non-zero):
  *
  *  - at least one refusal was actually thrown (the race happened — a run
  *    where the threads never collided proves nothing and fails loudly);
  *  - every batch landed EXACTLY once: committed generations are dense
  *    0..2n-1, no duplicate and no lost slice;
  *  - the racing store's candidates() equals a store built by the same
  *    slices appended SEQUENTIALLY — the lease turned concurrency into
  *    serialization, not corruption;
  *  - the lock is released at the end (no orphan lease after the storm).
  *
  * Knobs: STRESS_SLICES (default 6 per writer), SPARK_GRAFT_SF_DIR
  * (default sf0.001). Dev/CI harness — not engine code.
  */
object LeaseStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val slicesPerWriter = sys.env.getOrElse("STRESS_SLICES", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").persist()
    docs.count()
    val n = 2 * slicesPerWriter

    var failures = 0
    def check(name: String)(ok: Boolean, detail: => String): Unit = {
      if (ok) System.err.println(s"[lease-stress] OK  $name $detail")
      else { failures += 1; System.err.println(s"[lease-stress] FAIL $name $detail") }
    }

    // ---- the race: two threads, one store, retry-on-refusal ----
    val raceRoot = java.nio.file.Files.createTempDirectory("graft-leasestress-").toString
    val refusals = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    // daemon threads: a writer failing with a non-lease exception must
    // fail the RUN, not park two non-daemon workers and hang the JVM
    // after main's stack trace (bitten once)
    val pool = Executors.newFixedThreadPool(2, r => {
      val t = new Thread(r, "lease-stress-writer"); t.setDaemon(true); t
    })
    def writer(id: Int): Runnable = () => {
      // each thread gets its OWN store handle (own ledger identity), like
      // two separate processes would
      val st = IncrementalDedup.store(spark, raceRoot)
      start.await()
      (0 until slicesPerWriter).foreach { i =>
        val slice = id * slicesPerWriter + i
        var landed = false
        while (!landed) {
          try {
            st.append(docs.filter(pmod(col("doc_id"), lit(n)) === slice),
              idempotencyKey = Some(s"slice=$slice"))
            landed = true
          } catch {
            case _: GenLedger.ConcurrentWriterException =>
              refusals.incrementAndGet()
              Thread.sleep(50)
          }
        }
      }
    }
    val f0 = pool.submit(writer(0))
    val f1 = pool.submit(writer(1))
    start.countDown()
    try { f0.get(20, TimeUnit.MINUTES); f1.get(20, TimeUnit.MINUTES) }
    finally pool.shutdownNow()

    val raced = IncrementalDedup.store(spark, raceRoot)
    check("the race actually raced (refusals observed)")(
      refusals.get() > 0, s"(refusals=${refusals.get()})")
    check("every batch landed exactly once (dense generations, keyed)")(
      raced.committedGens() == (0 until n) &&
        raced.appliedKeys() == (0 until n).map(s => s"slice=$s").toSet,
      s"(gens=${raced.committedGens().mkString(",")} keys=${raced.appliedKeys().size})")
    check("no orphan lease after the storm")(
      !new java.io.File(raceRoot, "_lock").exists(), "")

    // ---- the oracle: same slices, sequential ----
    val seqRoot = java.nio.file.Files.createTempDirectory("graft-leaseseq-").toString
    val seq = IncrementalDedup.store(spark, seqRoot)
    (0 until n).foreach(s => seq.append(docs.filter(pmod(col("doc_id"), lit(n)) === s)))
    def candSet(st: IncrementalDedup.SignatureStore) =
      st.candidates(0.25).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    check("raced store == sequential store (serialized, not corrupted)")(
      candSet(raced) == candSet(seq),
      s"(raced pairs=${candSet(raced).size} sequential=${candSet(seq).size})")

    spark.stop()
    if (failures > 0) { System.err.println(s"[lease-stress] $failures FAILURES"); sys.exit(1) }
    System.err.println(s"[lease-stress] PASS ($n generations, ${refusals.get()} refusals)")
  }
}
