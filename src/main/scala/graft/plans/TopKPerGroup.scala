package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per group as a FIRST-CLASS physical operator — the full
  * custom-operator extension stack (logical node → planner strategy →
  * physical exec), complementing the library's custom Expressions
  * (functions.JaroWinkler) and optimizer rule (JaroWinklerLengthPruning).
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * — the composed form this library also ships (`topk_per_group`,
  * `lateral_topk`) — must SORT every partition in full and materialize
  * every row before the filter drops all but k. This operator is the
  * aggregate-shaped alternative: top-k is algebraic (partial results
  * merge), so a bounded k-heap per group runs on the map side, only
  * surviving rows shuffle, and the same heap merges after the exchange.
  * Per-group state is O(k) and nothing ever sorts more than it keeps —
  * the exact reason Spark plans global ORDER BY + LIMIT as
  * TakeOrderedAndProject instead of Sort → Limit; this node is that idea
  * per group.
  *
  * Scale shape: map-side pruning cuts the shuffle from |rows| to
  * ≤ k·|groups per partition|; the final heap runs after a hash exchange
  * on the group key. Memory is O(k · distinct groups per partition) per
  * task. Heap-count pressure in the PARTIAL exec is bounded by a flush
  * fallback (session conf `graft.topk.flushThreshold`, default 65536
  * groups): the map drains downstream and restarts, which is correct
  * because top-k partials merge associatively — the degenerate
  * all-groups-distinct case becomes a pass-through, never an OOM.
  *
  * Determinism: ties at the heap boundary keep the first-seen row, so
  * callers wanting reproducible output must make the ordering total (add
  * a unique tie-break column) — same contract as every top-k in this
  * library (ROUNDLOG: LIMIT ties broken by a unique key).
  */
case class TopKPerGroup(
    group: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k=$k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: one logical TopKPerGroup becomes partial (map-side,
  * any distribution) + final (after a hash exchange on the group key)
  * physical heaps — the partial/final split of a hash aggregate, with a
  * k-heap instead of an aggregation buffer.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val flushThreshold = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.topk.flushThreshold", "65536").toInt
      val partial = TopKPerGroupExec(g, o, k, partial = true, flushThreshold,
        planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, flushThreshold, partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per group. `partial = true` prunes within
  * whatever partitioning the child has; `partial = false` declares
  * ClusteredDistribution on the group key, so EnsureRequirements inserts
  * the one hash exchange between the two copies.
  */
case class TopKPerGroupExec(
    group: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    flushThreshold: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(group))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = group
    val orderLocal = order
    val schema = child.output
    // Heap-count pressure fallback (the r7 VERDICT hardening item): a
    // PARTIAL heap flushes its whole map downstream and starts fresh
    // whenever it holds `flushThreshold` groups. This is CORRECT because
    // top-k partials are associative — several partial outputs for the
    // same group merge in the final exec exactly like map-side combine
    // spilling multiple runs. Worst case (every row its own group) the
    // operator degrades to a pass-through of the input, i.e. the plain
    // hash-exchange + final-heap plan — never OOM. The FINAL exec must
    // hold every group of its hash partition, which the exchange already
    // bounds to |groups| / shuffle-partitions; it never flushes.
    val partialLocal = partial
    val thresholdLocal = if (partial) flushThreshold else Int.MaxValue
    // preservesPartitioning: output rows keep their partition; only keys
    // are projected, the rows themselves pass through
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val keyProj = UnsafeProjection.create(groupLocal, schema)
      // codegen'd row comparator over the SortOrder keys (interpreted
      // fallback built in); "smallest under the ordering" = best
      val ordering = RowOrdering.create(orderLocal, schema)
      // max-heap of the kept rows: head is the WORST survivor, so each
      // incoming row needs one compare against the head and rows that
      // can't enter the top-k are dropped without copying
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()

      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.offer(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }

      def drain(): Iterator[InternalRow] = {
        val queues = heaps.values().asScala.toVector
        heaps.clear()
        queues.iterator.flatMap(_.iterator().asScala)
      }

      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def advance(): Unit = {
          while (!cur.hasNext && !inputDone) {
            var flushed = false
            while (!flushed && iter.hasNext) {
              insert(iter.next())
              if (partialLocal && heaps.size() >= thresholdLocal) {
                cur = drain(); flushed = true
              }
            }
            if (!flushed) { cur = drain(); inputDone = true }
          }
        }
        override def hasNext: Boolean = { advance(); cur.hasNext }
        override def next(): InternalRow = { advance(); cur.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"
}

/** User-facing constructor + session registration. */
object TopKPerGroup {

  /** Idempotently register the planner strategy on a live session
    * (`spark.experimental.extraStrategies`, the runtime twin of
    * `spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKPerGroupStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerGroupStrategy
  }

  /** Top-k rows per group, columns resolved by name against `df`.
    * `orderBy` is (column, descending?) pairs evaluated in sequence — add a
    * unique final tie-break for deterministic output.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty && orderBy.nonEmpty, "need group and order columns")
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    // resolve like Spark does — honoring spark.sql.caseSensitive (default
    // case-INSENSITIVE) — and fail loudly on ambiguity instead of silently
    // picking the first of two same-named attributes after a join
    // (review r9: a case-sensitive find() rejected `id` vs `Id` that
    // df.select resolves, and chose arbitrarily among duplicates)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute = {
      val matches = analyzed.output.filter(a => resolver(a.name, name))
      if (matches.isEmpty) throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}")
      if (matches.size > 1) throw new IllegalArgumentException(
        s"column $name is ambiguous: ${matches.size} attributes match " +
          s"(qualify or rename before TopKPerGroup)")
      matches.head
    }
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graft.bridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), order, k, analyzed))
  }
}
