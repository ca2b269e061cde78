package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group via a partial-aggregating bounded buffer
  * (`Aggregator[IN, BUF, OUT]`, SURVEY.md §7.3's custom-aggregate surface).
  *
  * vs the window idiom (`row_number().over(partitionBy(g).orderBy(s))` +
  * `filter(rn <= k)`): the window shuffles and sorts EVERY row of the group;
  * this aggregator partial-aggregates map-side, so each partition ships at
  * most k candidates per group — at 100 TB with k=5 that is the difference
  * between shuffling the table and shuffling |groups|×k×partitions rows.
  * (Spark's WindowGroupLimit pushdown narrows the gap for rank filters, but
  * still sorts per partition; the heap does one linear pass.)
  *
  * Ordering: score desc, id asc — ties deterministic, matching
  * `row_number() OVER (ORDER BY score DESC, id ASC)`.
  */
object TopK {

  case class ScoredId(score: Double, id: Long)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Bounded-buffer top-k aggregator over (group, score, id) rows. Buffer is
    * a k-capped sorted list — for small k an insertion pass beats heap
    * bookkeeping.
    */
  class TopKAgg(k: Int) extends Aggregator[(String, Double, Long), List[ScoredId], Seq[ScoredId]] {
    override def zero: List[ScoredId] = Nil

    override def reduce(buf: List[ScoredId], a: (String, Double, Long)): List[ScoredId] =
      insert(buf, ScoredId(a._2, a._3))

    override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
      b2.foldLeft(b1)(insert)

    override def finish(r: List[ScoredId]): Seq[ScoredId] = r

    private def insert(buf: List[ScoredId], a: ScoredId): List[ScoredId] = {
      val (front, back) = buf.span(better(_, a))
      val merged = front ::: a :: back
      if (merged.length > k) merged.take(k) else merged
    }

    override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  }

  /** Top-k per group as a DataFrame op: returns (group, rn, id, score) with
    * rn in 1..k, ordered by (score desc, id asc) inside each group.
    *
    * The group key round-trips at its original type (the typed aggregation
    * keys on a string cast internally; the result is joined back to the
    * distinct original keys — a |groups|-sized join, tiny next to the scan).
    * `idCol` is returned as LONG and `scoreCol` as DOUBLE — ids are integral
    * and scores numeric throughout this engine.
    */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Rows with a NULL score are EXCLUDED: a top-k by an unknown score is
    // undefined, and the primitive Double in the typed boundary would
    // otherwise die with an opaque NOT_NULL_ASSERT_VIOLATION (round-10
    // sweep). idCol must be non-null (same encoder constraint); the
    // catalog oracle mirrors the score filter as `score IS NOT NULL`.
    val typed = df.filter(col(scoreCol).isNotNull).select(
      col(groupCol).cast("string").as("g"),
      col(scoreCol).cast("double").as("score"),
      col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
    val keys = df.select(col(groupCol)).distinct()
      .withColumn("__g", col(groupCol).cast("string"))
    typed
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("top"))
      .toDF("__ga", "top")
      // null-SAFE join-back: a null group key is a group like any other
      // under the row_number idiom this op mirrors — the null-unsafe
      // USING join silently dropped it (review r9)
      .join(keys, col("__ga") <=> col("__g"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "item")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("item.id").as(idCol), col("item.score").as(scoreCol))
  }
}
