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
}
