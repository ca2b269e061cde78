package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitsSpec extends SparkSpec {

  /** Reference interleave: bit i of a -> bit 2i, bit i of b -> bit 2i+1. */
  private def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("interleave16 matches the bit-by-bit reference") {
    import spark.implicits._
    val cases = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0), (0, 0xFFFF),
      (0xFFFF, 0xFFFF), (0x1234, 0xABCD), (42, 99), (65535, 32768))
    val got = cases.toDF("a", "b")
      .select(Bits.interleave16(col("a").cast("long"), col("b").cast("long")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === cases.map { case (a, b) => mortonRef(a, b) })
  }

  test("morton code orders locality: nearby points share high bits") {
    import spark.implicits._
    // points in the same 256x256 tile share the top 16 of 32 bits
    val df = Seq((1000, 2000), (1010, 2020), (40000, 60000)).toDF("a", "b")
      .select(shiftright(Bits.interleave16(col("a").cast("long"), col("b").cast("long")), 16).as("tile"))
    val tiles = df.collect().map(_.getLong(0))
    assert(tiles(0) === tiles(1))
    assert(tiles(0) !== tiles(2))
  }
}
