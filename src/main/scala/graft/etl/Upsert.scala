package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** MERGE/upsert semantics composed from relational primitives (Spark has no
  * native MERGE without a table format): updates win on key collision,
  * unmatched current rows survive, new keys append.
  *
  * Scale shape: `updates` is typically a daily batch, orders of magnitude
  * smaller than `current` — the left-anti join broadcasts the update KEYS
  * only (not the rows), so the big side streams through one broadcast probe
  * and never shuffles. Writing the result partitioned by a stable key range
  * gives the rewrite-only-affected-partitions pattern table formats
  * implement natively.
  *
  * Cluster-safe atomicity (the reference's staging ledger concern) comes
  * from writing to a fresh path + flipping a pointer — see meta.Staging.
  */
object Upsert {

  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(current.columns.sameElements(updates.columns),
      s"schema mismatch: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val keptCurrent = current.join(
      org.apache.spark.sql.functions.broadcast(updates.select(keys.map(col): _*)),
      keys, "left_anti")
    updates.unionByName(keptCurrent)
  }
}
