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
    * teleport (15%·scale/N) + damped (85%) contribution sum. The returned
    * frame is the operator's one persisted handle (Dedup cache contract).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // the undirected edge list is consumed twice (degree count, adjacency
    // build) and the caller's edge expression usually embeds a distinct —
    // cache it, or every consumer repays that shuffle (measured: the
    // edge-distinct ran 3x and dominated the whole computation). Prefer
    // INTEGER node ids in `edges`: shuffling/distincting longs is several
    // times cheaper than strings — render display labels from the final
    // (tiny) rank vector, not on the edge list.
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = und.join(broadcast(deg), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // base rank scale/N as a driver scalar: one 1-row fetch against the
    // cached deg (the IVF static-init pattern — index-vector metadata, not
    // data). The alternative (a 1-row broadcast frame) re-plans a
    // broadcast-exchange subtree into every iteration level — measured as
    // pure per-job overhead on the local harness.
    val base: Long = scale / deg.count()
    val teleport: Long = (15L * base) / 100L

    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var ranks = deg.select(col("src").as("node"), lit(base).as("rank"))
    for (_ <- 1 to iterations) {
      // broadcast the rank vector (|nodes| rows), NOT the adjacency: the
      // cached adj partitions never re-shuffle — each iteration is one
      // broadcast-hash join + one aggregate shuffle on dst. Each vector is
      // MATERIALIZED per iteration (it is |nodes|-sized, tiny relative to
      // the edges), keeping every plan level shallow — the batch analogue
      // of lineage checkpointing in any iterative Spark job.
      val next = adj.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"),
          expr(s"CAST($teleport + (85 * s) div 100 AS BIGINT)").as("rank"))
        .persist(level)
      next.count()
      ranks.unpersist() // no-op on the never-persisted init vector
      ranks = next
    }
    // the final vector is the one leaked handle (Dedup cache contract);
    // internal caches are released here
    adj.unpersist()
    deg.unpersist()
    und.unpersist()
    ranks
  }
}
