package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as repeated shuffle joins — PageRank here, the
  * same skeleton serves label propagation / hubs-authorities.
  *
  * Determinism: ranks are SCALED INTEGERS (default 1e12), every update uses
  * integer division (`div`), and sums of longs are exact — so the result is
  * bit-identical under any partitioning AND replayable by any engine with
  * 64-bit integers (the correctness oracle unrolls the same iterations in
  * SQL). A double-valued PageRank would differ across engines in the last
  * ulp per iteration and drift.
  *
  * Scale shape: the adjacency (src, dst, outdeg) is built once and cached —
  * each of the k iterations is one shuffle join + one aggregate against it.
  * At 100 TB the adjacency would be a bucketed table on src (join without
  * re-shuffle) and the loop would checkpoint every few iterations to cut
  * lineage; k is fixed (no convergence count() per pass — the fixed-point
  * delta check is the dedup_corpus lesson, one job per iteration is the
  * cost floor).
  */
object Graph {

  /** Fixed-iteration PageRank over an undirected edge list. Returns
    * (node, rank) with rank on the integer scale: init scale/N, update
    * teleport (15%·scale/N) + damped (85%) contribution sum.
    *
    * Shape (r8 verdict item 2): the adjacency is PRE-GROUPED to one row
    * per node — (src, outdeg, array&lt;dst&gt;) — in a single aggregation, so
    * the cached frame is |nodes| rows (not |edges|), the degree join of
    * the previous shape disappears, and each iteration is one shallow job:
    * cached-adj scan → broadcast-hash join against the rank vector →
    * explode → partial-agg map-side → one shuffle of partial sums. The
    * rank vector (|nodes| rows — already driver-bounded, it was shipped
    * whole in every broadcast of the previous shape) is COLLECTED between
    * iterations and re-joined as a local relation: that removes the
    * per-iteration persist+count job and the re-planned broadcast-exchange
    * subtree, which dominated the r8 profile. Past `maxVectorNodes` the
    * loop falls back to shuffle joins with per-iteration persist
    * checkpointing — slower, never driver-fatal (the Distribution gate
    * discipline).
    *
    * 100 TB hubs: collect_list packs a celebrity node's neighbours into
    * one row. Contributions are additive, so `hubSalts > 1` splits every
    * node whose degree exceeds `hubDegreeThreshold` into (src, salt)
    * sub-rows sharing the TRUE outdeg — each sub-row carries a
    * deterministic slice of the neighbour list (salt = hash(dst) mod
    * salts), so per-row width is bounded by deg/salts while rank sums are
    * bit-identical to the unsalted plan (property-spec'd). Sub-grouping by
    * (src, salt) keeps the edge-scale shuffle at ONE pass; the true outdeg
    * re-aggregates over sub-rows (|nodes|·salts scale, not |edges|), and
    * non-hub sub-rows merge back so the cached adjacency stays |nodes|
    * rows + ≤salts extra per hub.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000000000L,
      maxVectorNodes: Long = 10000000L, dedupEdges: Boolean = false,
      hubDegreeThreshold: Long = Long.MaxValue, hubSalts: Int = 1,
      adjPartitions: Int = 0): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, scale, maxVectorNodes,
      dedupEdges, hubDegreeThreshold, hubSalts, adjPartitions) match {
      case Left((spark, schema, rows)) => spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema)
      case Right(df) => df // the one leaked handle (Dedup cache contract)
    }

  /** PageRank's top-k, rendered: on the vector path (n ≤ `maxVectorNodes`)
    * the final rank vector is ALREADY driver-local, so the top-k selection
    * and display-label render happen in plain Scala — no extra Spark job
    * for a sort the driver can do on an in-memory array (r9 verdict item
    * 5). Past the gate it degrades to the distributed orderBy/limit with
    * `renderSql` applied to the node column. Ordering is (rank DESC, label
    * ASC); labels must be ASCII for the driver/SQL tie-break to agree
    * (String and UTF8String compare identically on ASCII).
    *
    * @param renderLocal label render on the driver (vector path)
    * @param renderSql   same render as a SQL expression over column name
    *                    `node` (distributed fallback) — keep semantically
    *                    identical to renderLocal
    */
  def pageRankTopK(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, k: Int, renderLocal: Any => String, renderSql: String,
      scale: Long = 1000000000000L, maxVectorNodes: Long = 10000000L,
      dedupEdges: Boolean = false, hubDegreeThreshold: Long = Long.MaxValue,
      hubSalts: Int = 1, adjPartitions: Int = 0): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, scale, maxVectorNodes,
      dedupEdges, hubDegreeThreshold, hubSalts, adjPartitions) match {
      case Left((spark, _, rows)) =>
        val top = rows.iterator
          .map(r => (renderLocal(r.get(0)), r.getLong(1)))
          .toArray
          .sortBy { case (label, rank) => (-rank, label) }
          .take(k)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.LongType, nullable = false)))
        spark.createDataFrame(new java.util.ArrayList(
          java.util.Arrays.asList(top.map { case (l, r) =>
            org.apache.spark.sql.Row(l, r) }: _*)), schema)
      case Right(df) =>
        df.select(expr(renderSql).as("node"), col("rank"))
          .orderBy(col("rank").desc, col("node")).limit(k)
    }

  /** Shared machinery: Left((session, schema, final driver-local rank
    * rows)) on the vector path — nothing left persisted; Right(distributed
    * ranks) past the gate — one persisted handle leaks by contract.
    */
  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long, maxVectorNodes: Long, dedupEdges: Boolean,
      hubDegreeThreshold: Long, hubSalts: Int, adjPartitions: Int)
      : Either[(org.apache.spark.sql.SparkSession,
          org.apache.spark.sql.types.StructType,
          Array[org.apache.spark.sql.Row]), DataFrame] = {
    require(iterations >= 1, "need at least one iteration")
    require(hubSalts >= 1, "hubSalts must be >= 1")
    // Edges with a NULL endpoint are EXCLUDED: a null node has no identity
    // to accumulate rank under, and leaving it in diverges engines (one
    // side's count(*) node census includes the null "node", shifting the
    // base rank b = scale/|V| and with it EVERY rank value — round-10
    // sweep). Unlike triangleStats' loud null-id guard (whose concern is
    // silent count corruption inside a packed min/max), dropping the edge
    // here is well-defined graph semantics: rank mass simply never flows
    // through a nameless endpoint. Oracles mirror with src/dst IS NOT NULL.
    val edgesNN = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    val spark = edges.sparkSession
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Prefer INTEGER node ids in `edges`: shuffling/distincting longs is
    // several times cheaper than strings — render display labels from the
    // final (tiny) rank vector, not on the edge list.
    //
    // dedupEdges = true FUSES the caller's edge-distinct into the adjacency
    // grouping (collect_set instead of a pre-distinct + collect_list): the
    // raw directed list unions straight off the scan and pays ONE shuffle
    // total instead of distinct's shuffle followed by the groupBy's. Leave
    // it false when multi-edge multiplicity should weight contributions.
    // (collect_set dedup stays exact under salting: dst determines its salt
    // bucket, so duplicates always land in the same sub-group.)
    val transients = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val directed = {
      val e0 = edgesNN.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      if (dedupEdges) e0
      else {
        // the caller's edge expression usually embeds a distinct — cache the
        // directed list ONCE so downstream consumers read the cache instead
        // of re-running that shuffle
        val e = e0.persist(level); transients += e; e
      }
    }
    // one-pass symmetrization (explode of both orientations) instead of a
    // union of two projections: the union form evaluated `directed` twice —
    // a second cache scan on the persisted branch, a second full scan of
    // the caller's edge expression on the dedupEdges branch
    val sym = directed.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val adjPlan =
      if (hubSalts == 1) {
        if (dedupEdges)
          sym.groupBy(col("src"))
            .agg(collect_set(col("dst")).as("dsts"))
            .select(col("src"), size(col("dsts")).cast("long").as("outdeg"), col("dsts"))
        else
          sym.groupBy(col("src"))
            .agg(count(lit(1)).as("outdeg"), collect_list(col("dst")).as("dsts"))
      } else {
        // hub salting: sub-group the one edge-scale shuffle by (src, salt),
        // re-derive the true outdeg over sub-rows, then merge non-hub
        // sub-rows back to one row per node — hubs stay split
        val bySalt = sym
          .withColumn("salt", pmod(hash(col("dst")), lit(hubSalts)))
          .groupBy(col("src"), col("salt"))
        val sub = (if (dedupEdges)
            bySalt.agg(collect_set(col("dst")).as("dsts"))
              .select(col("src"), size(col("dsts")).cast("long").as("cnt"), col("dsts"))
          else
            bySalt.agg(count(lit(1)).as("cnt"), collect_list(col("dst")).as("dsts"))
              .select(col("src"), col("cnt"), col("dsts")))
          .persist(level)
        transients += sub
        val outdeg = sub.groupBy(col("src")).agg(sum(col("cnt")).as("outdeg"))
        val joined = sub.join(outdeg, "src")
        joined.filter(col("outdeg") <= hubDegreeThreshold)
          .groupBy(col("src"), col("outdeg"))
          .agg(flatten(collect_list(col("dsts"))).as("dsts"))
          .select(col("src"), col("outdeg"), col("dsts"))
          .union(joined.filter(col("outdeg") > hubDegreeThreshold)
            .select(col("src"), col("outdeg"), col("dsts")))
      }
    // adjPartitions > 0 coalesces the CACHED adjacency: every iteration
    // launches one stage over it, so on a small-n graph 32 near-empty
    // cached partitions are pure task-launch overhead × iterations. A
    // cluster-scale caller leaves 0 (keep the shuffle width).
    val adj = (if (adjPartitions > 0) adjPlan.coalesce(adjPartitions) else adjPlan)
      .persist(level)
    val nRows = adj.count() // one action: fills adj (and any transient cache)
    transients.foreach(_.unpersist())
    if (nRows == 0) { // would otherwise die as a bare `/ by zero` below
      adj.unpersist()
      throw new IllegalArgumentException("pageRank: empty edge list — no nodes to rank")
    }
    // under salting a hub occupies several adjacency rows — N is nodes
    val n = if (hubSalts == 1) nRows
      else adj.agg(count_distinct(col("src"))).head().getLong(0)
    val base: Long = scale / n
    val teleport: Long = (15L * base) / 100L
    def step(ranks: DataFrame, bcast: Boolean) = {
      val side = if (bcast) broadcast(ranks) else ranks
      adj.join(side, col("src") === col("node"))
        .select(explode(col("dsts")).as("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          expr(s"CAST($teleport + (85 * s) div 100 AS BIGINT)").as("rank"))
    }
    val initNodes = if (hubSalts == 1) adj.select(col("src").as("node"))
      else adj.select(col("src").as("node")).distinct()
    val init = initNodes.select(col("node"), lit(base).as("rank"))
    val rankSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", adj.schema("src").dataType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false)))
    if (n <= graft.ScaleGates.cap(maxVectorNodes)) {
      def local(rows: Array[org.apache.spark.sql.Row]) = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), rankSchema)
      var rows = step(init, bcast = true).collect()
      for (_ <- 2 to iterations)
        rows = step(local(rows), bcast = true).collect()
      adj.unpersist()
      Left((spark, rankSchema, rows)) // nothing left persisted
    } else {
      // rank vector past driver budget: shuffle joins, each iteration
      // materialized via persist+count (lineage checkpointing)
      var ranks = init
      var prev: Option[DataFrame] = None
      for (_ <- 1 to iterations) {
        val next = step(ranks, bcast = false).persist(level)
        next.count()
        prev.foreach(_.unpersist())
        prev = Some(next)
        ranks = next
      }
      adj.unpersist()
      Right(ranks)
    }
  }

  /** Whole-graph triangle statistics over an undirected simple graph given
    * as a deduplicated edge list with `src < dst` (long node ids). Returns
    * ONE row: (n_nodes, n_edges, n_wedges, n_triangles, global_clustering).
    *
    * Scale shape — degree-ordered orientation (the standard distributed
    * triangle-count trick): each edge is directed from its lower-(degree,
    * id) endpoint to the higher one, so every triangle is counted exactly
    * once from its lowest-ordered vertex, and the wedge join fans out from
    * a vertex's OUT-neighbours only. A vertex of degree d contributes
    * O(outdeg²) wedge pairs, and orientation bounds outdeg by ~√|E| even
    * for celebrity vertices — the naive undirected join would square the
    * full degree of every hub. The wedge check is a left-semi join against
    * the oriented edges (build side shuffles once on the wedge endpoints).
    *
    * Determinism: all counts are exact integers; the only double is the
    * final clustering ratio (one division). The ordering key packs
    * (degree, id) into one long — valid while ids < 2^32.
    */
  def triangleStats(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxDriverEdges: Long = 5000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size-adaptive driver path (the commonNeighborScores / connected-
    // Components pattern): under the edge gate the whole census — guards
    // included — replays locally on the collected edge list; the wedge
    // pipeline below is the 100 TB fallback. One cache-filling count is
    // the only job the gate adds; it doubles as the null-id detector (a
    // null endpoint falls through to the distributed guard, which throws
    // the canonical error).
    val gateCounts = e.agg(count(lit(1)).as("n"),
      count(when(col("src").isNull || col("dst").isNull, 1)).as("nBad")).head()
    if (gateCounts.getLong(1) == 0L &&
        gateCounts.getLong(0) <= graft.ScaleGates.cap(maxDriverEdges)) {
      localTriangleStats(e) match {
        case Some(out) => e.unpersist(); return out
        case None => () // oriented-wedge budget exceeded — distributed below
      }
    }
    val deg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (driver gate above may have short-circuited; from here on: 100 TB plan)
    // packing precondition as a cheap runtime guard (ADVICE r7): ids must
    // fit in [0, 2^32) and degrees in [0, 2^31) or deg*2^32+id silently
    // corrupts the orientation. One 1-row agg over the persisted deg frame —
    // the node and wedge counts ride the same aggregate (they were a second
    // full pass over deg before), so they become driver constants here.
    val lim = deg.agg(min(col("node")).as("mn"), max(col("node")).as("mx"),
      max(col("deg")).as("md"), count(lit(1)).as("nn"),
      sum(expr("(deg * (deg - 1)) div 2")).as("nw"),
      count(col("node")).as("nonNull")).head()
    // ids that CAST to null (strings, null ids) evade a min/max-only guard
    // — nulls are skipped by min/max but still aggregate as one phantom
    // node, silently corrupting every count (review r9). count(node) vs
    // count(*) detects them for free on the same 1-row job. Guard failures
    // release the two persisted frames before throwing (no leaked handles
    // on the error path).
    val nullIds = lim.getLong(3) != lim.getLong(5)
    val packed = lim.isNullAt(0) ||
      (lim.getLong(0) >= 0L && lim.getLong(1) < 4294967296L &&
        lim.getLong(2) < Int.MaxValue.toLong)
    if (nullIds || !packed) {
      e.unpersist(); deg.unpersist()
      throw new IllegalArgumentException(
        if (nullIds)
          "triangleStats: some node ids are null after cast to long (null " +
            "or non-numeric ids) — supply integral ids in [0, 2^32)"
        else
          s"triangleStats packs (degree,id) into one long: node ids must " +
            s"be in [0, 2^32) and degrees < 2^31; got id range " +
            s"[${lim.get(0)}, ${lim.get(1)}], max degree ${lim.get(2)}")
    }
    val nNodes = lim.getLong(3)
    // deg is |nodes| rows — broadcast it (gated like kCore's alive set) so
    // the two degree joins never shuffle the edge list; the SAME un-projected
    // frame feeds both joins, so the second is served by ReuseExchange from
    // the first's broadcast. Past the gate: shuffle joins, never driver-fatal.
    val degB = if (nNodes <= graft.ScaleGates.cap(10000000L)) broadcast(deg) else deg
    // (degree, id) packed into one orderable long
    val keyed = e
      .join(degB, col("src") === col("node"))
      .select(col("src"), col("dst"),
        (col("deg") * lit(4294967296L) + col("src")).as("skey"))
      .join(degB, col("dst") === col("node"))
      .select(col("src"), col("dst"), col("skey"),
        (col("deg") * lit(4294967296L) + col("dst")).as("dkey"))
    val oriented = keyed.select(
      when(col("skey") < col("dkey"), col("src")).otherwise(col("dst")).as("u"),
      when(col("skey") < col("dkey"), col("dst")).otherwise(col("src")).as("v"),
      greatest(col("skey"), col("dkey")).as("vkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // IDENTICAL subtrees on both sides of the wedge self-join (aliases;
    // renames in the projection above): per-side renamed projections are
    // not `sameResult`, so the persisted oriented list was shuffled twice
    // on u — the shared subtree lets ReuseExchange serve the second side
    val wedgePairs = oriented.as("p")
      .join(oriented.as("q"), col("p.u") === col("q.u"))
      .filter(col("p.vkey") < col("q.vkey"))
      .select(col("p.v").as("a"), col("q.v").as("b"))
    val triangles = wedgePairs
      .join(oriented.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // n_nodes and n_wedges (sum over deg-choose-2) came off the guard agg;
    // e is already cache-filled by it, so the edge count is a cached scan
    val nEdges = e.count()
    val nWedges: java.lang.Long = if (lim.isNullAt(4)) null else Long.box(lim.getLong(4))
    // clustering is undefined without wedges: a graph of disjoint single
    // edges (every degree 1, nWedges == 0 — seen on the 2× pseudo-scale
    // fixture where each user co-occurs only with its replica twin) must
    // yield NULL like the oracle's x/0, not an ANSI DIVIDE_BY_ZERO crash.
    // nWedges is a driver constant, so the branch is decided here, not per
    // row.
    val clustering =
      if (nWedges == null || nWedges.longValue == 0L) lit(null).cast("double")
      else col("n_triangles").cast("double") * 3.0 / lit(nWedges.longValue)
    val out = triangles
      .select(lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
        lit(nWedges).cast("long").as("n_wedges"), col("n_triangles"),
        clustering.as("global_clustering"))
    Dedup.materializeAndRelease(out, e, deg, oriented)
  }

  /** Driver-local exact replica of the triangle census for edge lists under
    * the gate: same multiset degrees, same (degree, id) packing guard (and
    * its exact error text, with the edge cache released before the throw),
    * same degree-ordered orientation, same strict `p.vkey < q.vkey` wedge
    * expansion and set-membership closure check. Returns None when the
    * oriented wedge-pair count exceeds `maxWedges` (hub-heavy graphs keep
    * the distributed plan, whose orientation bound is the point).
    */
  private def localTriangleStats(e: DataFrame,
      maxWedges: Long = 20000000L): Option[DataFrame] = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val nEdges = pairs.length.toLong
    // node index: sorted distinct endpoints
    val endpoints = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      endpoints(2 * i) = pairs(i)._1; endpoints(2 * i + 1) = pairs(i)._2; i += 1
    }
    java.util.Arrays.parallelSort(endpoints)
    var nNodes = 0
    i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) nNodes += 1
      i += 1
    }
    val nodes = new Array[Long](nNodes)
    var j = 0; i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) { nodes(j) = endpoints(i); j += 1 }
      i += 1
    }
    def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val degA = new Array[Long](nNodes)
    i = 0
    while (i < pairs.length) {
      degA(idx(pairs(i)._1)) += 1; degA(idx(pairs(i)._2)) += 1; i += 1
    }
    // the packing guard, locally (null ids cannot reach here — the gate
    // sends them to the distributed guard): same precondition, same error
    if (nNodes > 0) {
      val mn = nodes(0); val mx = nodes(nNodes - 1)
      val md = degA.max
      if (!(mn >= 0L && mx < 4294967296L && md < Int.MaxValue.toLong)) {
        e.unpersist()
        throw new IllegalArgumentException(
          s"triangleStats packs (degree,id) into one long: node ids must " +
            s"be in [0, 2^32) and degrees < 2^31; got id range " +
            s"[$mn, $mx], max degree $md")
      }
    }
    var nWedgesL = 0L
    i = 0
    while (i < nNodes) { nWedgesL += degA(i) * (degA(i) - 1) / 2; i += 1 }
    // degree-ordered orientation: out-adjacency of (v, vkey) per u
    val outDeg = new Array[Int](nNodes)
    def skeyOf(node: Long): Long = degA(idx(node)) * 4294967296L + node
    i = 0
    while (i < pairs.length) {
      val (s, d) = pairs(i)
      val u = if (skeyOf(s) < skeyOf(d)) s else d
      outDeg(idx(u)) += 1
      i += 1
    }
    var orientedWedges = 0L
    i = 0
    while (i < nNodes) { orientedWedges += outDeg(i).toLong * (outDeg(i) - 1) / 2; i += 1 }
    if (orientedWedges > maxWedges) return None
    val off = new Array[Int](nNodes + 1)
    i = 0
    while (i < nNodes) { off(i + 1) = off(i) + outDeg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, nNodes)
    val outV = new Array[Long](pairs.length)    // v per oriented edge
    val outVk = new Array[Long](pairs.length)   // its vkey (sort key)
    val member = new Array[Long](pairs.length)  // packed (u, v) set
    i = 0
    while (i < pairs.length) {
      val (s, d) = pairs(i)
      val sk = skeyOf(s); val dk = skeyOf(d)
      val u = if (sk < dk) s else d
      val v = if (sk < dk) d else s
      val ui = idx(u)
      outV(fill(ui)) = v; outVk(fill(ui)) = math.max(sk, dk); fill(ui) += 1
      member(i) = (u << 32) | v
      i += 1
    }
    java.util.Arrays.parallelSort(member)
    // per-u out-lists sorted by vkey; strict vkey ordering drops duplicate
    // oriented edges exactly like the p.vkey < q.vkey join filter
    var nTriangles = 0L
    var n = 0
    while (n < nNodes) {
      val lo = off(n); val hi = off(n + 1)
      if (hi - lo >= 2) {
        // insertion sort of the (vkey, v) slice by vkey (out-lists are
        // √E-bounded by orientation; tiny in practice)
        var a = lo + 1
        while (a < hi) {
          val vk = outVk(a); val vv = outV(a)
          var b = a - 1
          while (b >= lo && outVk(b) > vk) {
            outVk(b + 1) = outVk(b); outV(b + 1) = outV(b); b -= 1
          }
          outVk(b + 1) = vk; outV(b + 1) = vv
          a += 1
        }
        a = lo
        while (a < hi) {
          var b = a + 1
          while (b < hi) {
            if (outVk(a) < outVk(b) &&
              java.util.Arrays.binarySearch(member, (outV(a) << 32) | outV(b)) >= 0)
              nTriangles += 1
            b += 1
          }
          a += 1
        }
      }
      n += 1
    }
    val nWedges: java.lang.Long = if (nNodes == 0) null else Long.box(nWedgesL)
    // same output expressions as the distributed tail (schema-identical):
    // lit(count) for the aggregate's non-null long, the same null-vs-ratio
    // clustering branch on the same driver constant
    val clustering =
      if (nWedges == null || nWedges.longValue == 0L) lit(null).cast("double")
      else lit(nTriangles).cast("double") * 3.0 / lit(nWedges.longValue)
    Some(spark.range(1).select(
      lit(nNodes.toLong).as("n_nodes"), lit(nEdges).as("n_edges"),
      lit(nWedges).cast("long").as("n_wedges"), lit(nTriangles).as("n_triangles"),
      clustering.as("global_clustering")))
  }

  /** k-core decomposition by iterative peeling: repeatedly drop nodes whose
    * degree among the still-alive nodes is < k, to fixpoint. Returns the
    * surviving nodes with their in-core degree — the dense backbone of the
    * graph (spam rings, tight co-activity cliques).
    *
    * Determinism: the fixpoint is unique (peeling order never changes the
    * k-core), so any engine that iterates to convergence agrees — the
    * oracle unrolls the same peels in SQL CTEs. Each iteration is one
    * filtered degree aggregate + a count() convergence probe (the
    * one-job-per-iteration cost floor, same as connectedComponents). Peel
    * counts are small in practice: real graphs shed low-degree fringe in
    * 1-3 rounds (measured: 2 rounds at sf0.01, 0 at sf0.1).
    *
    * Scale shape: the alive set only shrinks, so the per-iteration joins
    * get cheaper monotonically; AQE picks broadcast for the alive side
    * once it fits. At 100 TB you would checkpoint `alive` every few peels
    * to cut lineage, exactly like the PageRank loop above.
    */
  def kCore(edges: DataFrame, k: Int = 2, maxIter: Int = 20,
      srcCol: String = "src", dstCol: String = "dst",
      maxDriverEdges: Long = 5000000L): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the caller's (possibly expensive) edge expression is evaluated ONCE
    // into this cache; every consumer below — the driver gate, the local
    // collect, or each peel's symmetrized scan — reads the cache
    val esel = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .persist(level)
    // symmetrize in ONE pass over the cache: the union-of-two-projections
    // form scanned it twice per consumer (r15 optimization round)
    val sym = esel.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // Size-adaptive driver path (the commonNeighborScores pattern): peeling
    // is a per-node counting loop — under the edge gate it runs locally in
    // O(edges · peels) with zero per-iteration Spark jobs (each peel was a
    // full count + aggregate job over a KB-scale graph). Null endpoints
    // fall back to the distributed loop, where a null node is a regular
    // group (unchanged semantics).
    val gateCounts = esel.agg(count(lit(1)).as("n"),
      count(when(col("src").isNull || col("dst").isNull, 1)).as("nBad")).head()
    if (gateCounts.getLong(1) == 0L &&
        gateCounts.getLong(0) <= graft.ScaleGates.cap(maxDriverEdges)) {
      val out = localKCore(esel, k, maxIter, sym.schema("src").nullable)
      esel.unpersist()
      return out
    }
    // broadcast the alive set, NOT the edges — the pageRank vector pattern
    // (lesson 22: a frame behind an aggregate has no planner stats, so
    // these joins default to sort-merge and re-sort the persisted edge
    // list every peel). |alive| ≤ |nodes|, the same driver-size class as
    // the rank vector; the edge side never re-shuffles.
    // gated on the alive-set size the loop already counts: the FIRST peel's
    // alive set is the full vertex set, and an unguarded broadcast of
    // hundreds of millions of nodes is the same driver-OOM class the
    // Distribution gates exist for (review r8); past the cap the joins
    // fall back to shuffles — slower, never fatal
    // ONE broadcast-gated frame reused by both join sides (ADVICE r8: two
    // broadcast() wrappers with per-side alias projections shipped the
    // up-to-10M-row alive set twice per peel) — identical exchange child
    // plans, so ReuseExchange serves the second join from the first's
    // broadcast by construction
    def degAmong(alive: DataFrame, nAlive: Long): DataFrame = {
      val gate = if (nAlive <= graft.ScaleGates.cap(10000000L)) broadcast(alive) else alive
      sym.join(gate, col("src") === col("node")).drop("node")
        .join(gate, col("dst") === col("node")).drop("node")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
    }
    // Peel 1 fused: "degree among alive" over the FULL node set is the
    // plain degree, so the first iteration is one groupBy over sym — no
    // distinct() to build the node set, no alive-side joins. The node
    // count (convergence baseline) rides the same aggregate's row count.
    val deg0 = sym.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist(level)
    val n = deg0.count()
    var alive = deg0.filter(col("deg") >= k)
      .select(col("src").as("node")).persist(level)
    var aliveCount = alive.count()
    var converged = aliveCount == n
    var iter = 1
    while (!converged && iter < maxIter) {
      val next = degAmong(alive, aliveCount).filter(col("deg") >= k)
        .select(col("src").as("node")).persist(level)
      val c = next.count()
      converged = c == aliveCount
      alive.unpersist()
      alive = next
      aliveCount = c
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] WARN kCore: not converged after maxIter=$maxIter peels")
    // zero nodes peeled → the full-degree aggregate IS the answer; reuse it
    val out =
      if (converged && iter == 1)
        deg0.filter(col("deg") >= k)
          .select(col("src").as("node"), col("deg").as("core_deg"))
      else degAmong(alive, aliveCount)
        .select(col("src").as("node"), col("deg").as("core_deg"))
    Dedup.materializeAndRelease(out, esel, alive, deg0)
  }

  /** Driver-local exact replica of the peeling loop for edge lists under
    * the gate: symmetric multiset degrees (self-loops count twice), peel
    * nodes whose degree among the still-alive set is < k to fixpoint,
    * return survivors with their in-core degree — including the two edge
    * behaviors the distributed loop has: an alive node with zero alive
    * neighbours drops out of the output (it forms no group), and a
    * non-converged run (maxIter) emits the degrees of whatever set the
    * last peel left, sub-k rows included.
    */
  private def localKCore(e: DataFrame, k: Int, maxIter: Int,
      nodeNullable: Boolean): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val endpoints = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      endpoints(2 * i) = pairs(i)._1; endpoints(2 * i + 1) = pairs(i)._2; i += 1
    }
    java.util.Arrays.parallelSort(endpoints)
    var nNodes = 0
    i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) nNodes += 1
      i += 1
    }
    val nodes = new Array[Long](nNodes)
    var j = 0; i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) { nodes(j) = endpoints(i); j += 1 }
      i += 1
    }
    def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    val srcI = new Array[Int](pairs.length)
    val dstI = new Array[Int](pairs.length)
    val deg0 = new Array[Long](nNodes)
    i = 0
    while (i < pairs.length) {
      srcI(i) = idx(pairs(i)._1); dstI(i) = idx(pairs(i)._2)
      deg0(srcI(i)) += 1; deg0(dstI(i)) += 1
      i += 1
    }
    val alive = new Array[Boolean](nNodes)
    var aliveCount = 0L
    i = 0
    while (i < nNodes) { alive(i) = deg0(i) >= k; if (alive(i)) aliveCount += 1; i += 1 }
    var converged = aliveCount == nNodes.toLong
    var iter = 1
    while (!converged && iter < maxIter) {
      val d = new Array[Long](nNodes)
      i = 0
      while (i < pairs.length) {
        if (alive(srcI(i)) && alive(dstI(i))) { d(srcI(i)) += 1; d(dstI(i)) += 1 }
        i += 1
      }
      var c = 0L
      i = 0
      while (i < nNodes) {
        val keep = alive(i) && d(i) >= k
        alive(i) = keep
        if (keep) c += 1
        i += 1
      }
      converged = c == aliveCount
      aliveCount = c
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] WARN kCore: not converged after maxIter=$maxIter peels")
    // output: iter == 1 short-circuit returns the full-degree aggregate
    // filtered at k; otherwise the degree-among-final-alive map, where a
    // node only appears if it still has an alive edge
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    if (converged && iter == 1) {
      i = 0
      while (i < nNodes) {
        if (deg0(i) >= k) rows += org.apache.spark.sql.Row(nodes(i), deg0(i))
        i += 1
      }
    } else {
      val d = new Array[Long](nNodes)
      i = 0
      while (i < pairs.length) {
        if (alive(srcI(i)) && alive(dstI(i))) { d(srcI(i)) += 1; d(dstI(i)) += 1 }
        i += 1
      }
      i = 0
      while (i < nNodes) {
        if (alive(i) && d(i) > 0L) rows += org.apache.spark.sql.Row(nodes(i), d(i))
        i += 1
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = nodeNullable),
      org.apache.spark.sql.types.StructField("core_deg",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows.toSeq: _*)), schema)
  }

  /** Link prediction by common-neighbour count: top-`topK` NON-adjacent
    * pairs sharing ≥ `minCommon` neighbours, scored by neighbourhood
    * Jaccard `common / (deg_u + deg_v − common)`. Same wedge-expansion
    * shuffle shape as [[triangleStats]]; the top-k cut is an
    * orderBy+limit (TakeOrderedAndProject — per-partition heaps), so only
    * the ≤topK winners ever see a window. Counts are exact integers; the
    * Jaccard is a single division.
    */
  def commonNeighborScores(edges: DataFrame, minCommon: Int = 2, topK: Int = 20,
      srcCol: String = "src", dstCol: String = "dst",
      maxDriverEdges: Long = 5000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one-pass symmetrization (explode of both orientations) instead of a
    // union of two projections — the union form scanned the cached edge
    // list twice per consumer and doubled the task count of every stage
    // over `sym` (r15 optimization round, same change as kCore/pageRank)
    val sym = e.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val w = Window.orderBy(col("jaccard").desc, col("u"), col("v"))
    val scored = sym.select(col("src").as("u"), col("dst").as("w"))
      .join(sym.select(col("src").as("w"), col("dst").as("v")), "w")
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      // adjacency check normalized to the pair orientation (u < v): an edge
      // stored (5, 3) must still exclude pair (3, 5) — anti-joining the raw
      // directed list leaked adjacent pairs into the "non-adjacent"
      // predictions when inputs weren't pre-normalized (review r9)
      .join(e.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")), Seq("u", "v"), "left_anti")
      // identical deg subtree on both ends (renames above the join) so the
      // degree aggregate is built once and ReuseExchange serves the second
      // join — per-side renamed projections recomputed it per end
      .join(deg, col("u") === col("node")).drop("node")
      .withColumnRenamed("deg", "du")
      .join(deg, col("v") === col("node")).drop("node")
      .withColumnRenamed("deg", "dv")
      .withColumn("jaccard", col("common").cast("double")
        / (col("du") + col("dv") - col("common")))
      // top-k via orderBy+limit (TakeOrderedAndProject: per-partition
      // k-heaps, no global sort), THEN the rank window over only ≤topK
      // rows — windowing the full candidate frame would single-task it
      .orderBy(col("jaccard").desc, col("u"), col("v"))
      .limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("u"), col("v"), col("common"), col("jaccard"))
    // Size-adaptive driver path (the connectedComponents / pageRank-vector
    // pattern, gated through ScaleGates): the candidate-pair graph behind
    // link prediction is driver-bounded whenever the edge list is (5M edges
    // ≈ 160 MB as primitive tuples — connectedComponents' budget), and the
    // distributed wedge pipeline pays ~10 shuffle/broadcast stage launches
    // whose FIXED cost dwarfs the data at that size (r15 verdict item 2:
    // 32-core time 2.3× the 8-core time on a 23k-edge graph — per-stage
    // overhead scales with cores, the work does not). The same one-row
    // aggregate that fills the cache also guards the gate: null endpoints
    // or ids outside [0, 2^32) (the packed-key precondition, as in
    // triangleStats) fall back to the distributed plan, as does a wedge
    // count past the budget (hub-heavy graphs, checked from the collected
    // degrees before any quadratic work). Semantics are replicated on the
    // multiset exactly — duplicate edges multiply wedge counts and degrees
    // just as the join/aggregate pipeline does.
    val lim = e.agg(count(lit(1)).as("n"),
      count(when(col("src").isNull || col("dst").isNull, 1)).as("nBad"),
      min(least(col("src"), col("dst"))).as("mn"),
      max(greatest(col("src"), col("dst"))).as("mx")).head()
    val nEdges = lim.getLong(0)
    val nBad = lim.getLong(1)
    val packable = nEdges == 0L ||
      (!lim.isNullAt(2) && lim.getLong(2) >= 0L && lim.getLong(3) < 4294967296L)
    if (nBad == 0L && packable && nEdges <= graft.ScaleGates.cap(maxDriverEdges)) {
      localCommonNeighborScores(e, minCommon, topK, scored.schema) match {
        case Some(out) => e.unpersist(); return out
        case None => () // wedge budget exceeded — distributed fallback below
      }
    }
    Dedup.materializeAndRelease(scored, e)
  }

  /** Driver-local exact replica of the wedge/anti-join/Jaccard pipeline in
    * [[commonNeighborScores]], for edge lists under the gate. Packs each
    * unordered pair into one long (ids < 2^32, pre-checked), enumerates
    * wedge pairs per center, sorts and run-counts them — O(wedges log
    * wedges) with zero boxing. Returns None when Σ deg·(deg−1)/2 exceeds
    * `maxWedges` (the quadratic blow-up budget: 20M packed longs = 160 MB,
    * checked from the degree array BEFORE any allocation of that size).
    */
  private def localCommonNeighborScores(e: DataFrame, minCommon: Int, topK: Int,
      schema: org.apache.spark.sql.types.StructType,
      maxWedges: Long = 20000000L): Option[DataFrame] = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    // node index: sorted distinct endpoint array + binary search (no boxing)
    val endpoints = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      endpoints(2 * i) = pairs(i)._1; endpoints(2 * i + 1) = pairs(i)._2; i += 1
    }
    java.util.Arrays.parallelSort(endpoints)
    var nNodes = 0
    i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) nNodes += 1
      i += 1
    }
    val nodes = new Array[Long](nNodes)
    var j = 0; i = 0
    while (i < endpoints.length) {
      if (i == 0 || endpoints(i) != endpoints(i - 1)) { nodes(j) = endpoints(i); j += 1 }
      i += 1
    }
    def idx(x: Long): Int = java.util.Arrays.binarySearch(nodes, x)
    // symmetric multiset degrees (self-loops count twice, exactly like the
    // sym groupBy)
    val degA = new Array[Int](nNodes)
    i = 0
    while (i < pairs.length) {
      degA(idx(pairs(i)._1)) += 1; degA(idx(pairs(i)._2)) += 1; i += 1
    }
    var wedges = 0L
    i = 0
    while (i < nNodes) { wedges += degA(i).toLong * (degA(i) - 1) / 2; i += 1 }
    if (wedges > maxWedges) return None
    // CSR adjacency over the symmetric multiset
    val off = new Array[Int](nNodes + 1)
    i = 0
    while (i < nNodes) { off(i + 1) = off(i) + degA(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, nNodes)
    val nbr = new Array[Long](pairs.length * 2)
    i = 0
    while (i < pairs.length) {
      val s = idx(pairs(i)._1); val d = idx(pairs(i)._2)
      nbr(fill(s)) = pairs(i)._2; fill(s) += 1
      nbr(fill(d)) = pairs(i)._1; fill(d) += 1
      i += 1
    }
    // packed unordered wedge pairs: one entry per (center, i<j) combination
    // with distinct endpoint values — the join's u<v filter drops equal
    // endpoints, duplicates multiply counts (multiset semantics)
    val wp = new Array[Long](wedges.toInt)
    var k = 0
    var n = 0
    while (n < nNodes) {
      var a = off(n)
      while (a < off(n + 1)) {
        var b = a + 1
        while (b < off(n + 1)) {
          val x = nbr(a); val y = nbr(b)
          if (x != y) {
            val lo = math.min(x, y); val hi = math.max(x, y)
            wp(k) = (lo << 32) | hi; k += 1
          }
          b += 1
        }
        a += 1
      }
      n += 1
    }
    java.util.Arrays.parallelSort(wp, 0, k)
    // packed normalized edge set for the non-adjacency check
    val es = new Array[Long](pairs.length)
    i = 0
    while (i < pairs.length) {
      val lo = math.min(pairs(i)._1, pairs(i)._2)
      val hi = math.max(pairs(i)._1, pairs(i)._2)
      es(i) = (lo << 32) | hi; i += 1
    }
    java.util.Arrays.parallelSort(es)
    // run-count the sorted wedge pairs; keep (common >= minCommon) and
    // non-adjacent; score by neighbourhood Jaccard
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    i = 0
    while (i < k) {
      var r = i + 1
      while (r < k && wp(r) == wp(i)) r += 1
      val common = (r - i).toLong
      if (common >= minCommon && java.util.Arrays.binarySearch(es, wp(i)) < 0) {
        val u = wp(i) >>> 32
        val v = wp(i) & 0xFFFFFFFFL
        val jac = common.toDouble / (degA(idx(u)) + degA(idx(v)) - common)
        buf += ((u, v, common, jac))
      }
      i = r
    }
    val top = buf.toArray
      .sortBy { case (u, v, _, jac) => (-jac, u, v) }
      .take(topK)
    val rows = top.iterator.zipWithIndex.map { case ((u, v, c, jac), r) =>
      org.apache.spark.sql.Row((r + 1).toLong, u, v, c, jac)
    }.toArray
    Some(spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), schema))
  }
}
