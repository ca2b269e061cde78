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
  * task, spill-free by construction when k is small (the intended regime;
  * a production hardening would fall back to sort-based on heap-count
  * pressure, as hash aggregate falls back to sort aggregate).
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
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
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
    // preservesPartitioning: output rows keep their partition; only keys
    // are projected, the rows themselves pass through
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, schema)
      // codegen'd row comparator over the SortOrder keys (interpreted
      // fallback built in); "smallest under the ordering" = best
      val ordering = RowOrdering.create(orderLocal, schema)
      // max-heap of the kept rows: head is the WORST survivor, so each
      // incoming row needs one compare against the head and rows that
      // can't enter the top-k are dropped without copying
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
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
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
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
    def attr(name: String): Attribute = analyzed.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graft.bridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), order, k, analyzed))
  }
}
