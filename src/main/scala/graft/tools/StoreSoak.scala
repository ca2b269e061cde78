package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup
import graft.streaming.DedupIngestStream

/** Generation-ledger soak for the persisted dedup store: does read cost
  * stay bounded by LIVE data as generations accumulate, and does
  * `compact()` actually restore it?
  *
  * StreamSoak (r13) proved streaming STATE stays watermark-bounded over
  * hundreds of micro-batches; this tool proves the same boundedness for
  * the store's generation ledger — the other unbounded-growth risk in the
  * daily-ingest deployment. It streams `waves × filesPerWave` single-file
  * micro-batches into a store via [[DedupIngestStream]] (each file = one
  * generation delta), compacting after each wave, and measures at every
  * wave boundary: committed generations, store file census, and the wall
  * time of a full `candidates()` read.
  *
  * Gates (exit non-zero on violation):
  *  - post-compact file count stays ≤ a fixed bound regardless of how
  *    many generations EVER existed (read amplification is O(live), not
  *    O(history));
  *  - each compact makes the read no slower (t_after ≤ t_before × 1.25 —
  *    the fold must actually help, noise-tolerant);
  *  - the idempotency-key ledger survives every fold (keys == batches
  *    ingested so far), so exactly-once outlives arbitrary compaction
  *    cadence;
  *  - generation count returns to 1 after each compact and grows only by
  *    the wave size between them.
  *
  * Knobs: SOAK_WAVES (default 4), SOAK_FILES (default 15 per wave),
  * SPARK_GRAFT_SF_DIR (default sf0.001 — slices are tiny by design; the
  * soak stresses LEDGER length, not batch volume). Dev/CI harness, not
  * engine code.
  */
object StoreSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val waves = sys.env.getOrElse("SOAK_WAVES", "4").toInt
    val filesPerWave = sys.env.getOrElse("SOAK_FILES", "15").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 8) // tiny micro-batches
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").persist()
    val nSlices = waves * filesPerWave
    val root = Files.createTempDirectory("graft-storesoak-").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))

    def dropFile(idx: Int): Unit = {
      val tmp = s"$root/slice$idx"
      docs.filter(pmod(col("doc_id"), lit(nSlices)) === idx)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = Paths.get(inbox, f"f$idx%05d.parquet")
      Files.move(part.toPath, dst)
      // strictly increasing mtimes: deterministic backlog order (r13 lesson 2)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + idx * 1000L))
    }

    var failures = 0
    def check(name: String)(ok: Boolean, detail: => String): Unit = {
      if (ok) System.err.println(s"[store-soak] OK  $name $detail")
      else { failures += 1; System.err.println(s"[store-soak] FAIL $name $detail") }
    }
    // best of 2: one GC pause or page-cache eviction during a single timed
    // read used to fail the no-slower gate spuriously, and this cell is in
    // the DEFAULT matrix tier (ADVICE r13)
    def timeRead(st: IncrementalDedup.SignatureStore): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        st.candidates(0.25).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    var ingested = 0
    val postCompactFiles = Seq.newBuilder[Int]
    (0 until waves).foreach { w =>
      (0 until filesPerWave).foreach(i => dropFile(w * filesPerWave + i))
      DedupIngestStream.runOnce(spark, inbox, docs.schema, s"$root/store", s"$root/ckpt")
      ingested += filesPerWave
      val st = IncrementalDedup.store(spark, s"$root/store")
      // the stats() snapshot IS the census now (r13 verdict item 6): the
      // soak doubles as the proof that a deployment can drive compaction
      // policy from the store's own observability numbers
      val before = st.stats()
      val tBefore = timeRead(st)
      // generations grow only by the wave size between compacts
      check(s"wave $w: generation bookkeeping")(
        before.generations == (if (w == 0) filesPerWave else filesPerWave + 1),
        s"(gens=${before.generations} after $ingested batches)")
      // the POLICY drives the fold now (r14 verdict item 4): the wave just
      // committed filesPerWave generations, so the threshold below it must
      // trip — and a second call right after must no-op on the single fold
      check(s"wave $w: compactIfNeeded trips over the generation threshold")(
        st.compactIfNeeded(maxGens = filesPerWave - 1),
        s"(gens=${before.generations} > ${filesPerWave - 1} must fold)")
      check(s"wave $w: compactIfNeeded no-ops right after the fold")(
        !st.compactIfNeeded(maxGens = filesPerWave - 1),
        "(a single generation has nothing to fold)")
      val after = st.stats()
      val tAfter = timeRead(st)
      postCompactFiles += after.dataFiles.toInt
      System.err.println(
        f"[store-soak] wave $w: gens ${before.generations}->${after.generations}, " +
          f"files ${before.dataFiles}->${after.dataFiles}, " +
          f"bytes ${before.dataBytes}->${after.dataBytes}, " +
          f"read ${tBefore}%.2f->${tAfter}%.2f s")
      check(s"wave $w: compact restores a single generation")(
        after.generations == 1 && !after.maskJoinActive,
        s"(gens=${after.generations} maskJoin=${after.maskJoinActive})")
      check(s"wave $w: compact makes the read no slower")(
        tAfter <= tBefore * 1.25, f"(before=${tBefore}%.2f after=${tAfter}%.2f)")
      check(s"wave $w: idempotency keys survive the fold (stats ledger)")(
        after.appliedKeys == ingested,
        s"(keys=${after.appliedKeys} batches=$ingested)")
      check(s"wave $w: compact shrinks the file census")(
        after.dataFiles <= before.dataFiles,
        s"(files ${before.dataFiles} -> ${after.dataFiles})")
    }

    // the headline gate: post-compact file count is bounded by LIVE data
    // layout (compact writes at compute parallelism over live rows), not
    // by the number of generations ever committed
    val pcf = postCompactFiles.result()
    check("post-compact file count bounded across the soak")(
      pcf.max <= pcf.head * 2 + 8,
      s"(post-compact files per wave: ${pcf.mkString(", ")}; " +
        s"${ingested} generations ever committed)")

    spark.stop()
    if (failures > 0) { System.err.println(s"[store-soak] $failures FAILURES"); sys.exit(1) }
    System.err.println(s"[store-soak] PASS ($ingested generations, ${pcf.size} compactions)")
  }
}
