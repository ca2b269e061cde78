package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split (on by default in the session configs) is the first
  * line of defense; explicit salting is for the cases AQE can't fix — e.g. a
  * shuffled join where one key holds 10% of 100 TB and even a split
  * partition's build side won't fit, or engines/pipelines where the skew is
  * known ahead of time and deterministic layout matters.
  *
  * Shape: the big side gets a pseudo-random salt in [0, buckets); the small
  * side is replicated `buckets`× with every salt value; the join key becomes
  * (key, salt), so a hot key's rows spread over `buckets` reducers. Cost:
  * small side shuffles buckets× — pick buckets ≈ (hot-key rows / normal
  * partition size).
  */
object Skew {

  /** Inner equi-join of `big` × `small` on big(bigKey) == small(smallKey)
    * with the big side salted into `buckets` sub-keys. Result multiset is
    * identical to the unsalted join (verified by SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      buckets: Int): DataFrame = {
    // buckets = 0 would make pmod null and sequence(0, -1) descending —
    // a silently EMPTY join rather than an error (review r9)
    require(buckets >= 1, s"buckets=$buckets must be positive")
    // salt from the row's own key + a per-row spreader; xxhash64 of the
    // monotonically increasing id is uniform and cheap (value itself is
    // partition-dependent, but any uniform value works — the join result
    // does not depend on which salt a row lands on)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted
      .join(smallSalted, bigSalted(bigKey) === smallSalted(smallKey) &&
        bigSalted("__salt") === smallSalted("__salt"), "inner")
      .drop("__salt")
  }
}
