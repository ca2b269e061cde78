package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-twiddling column math for space-filling-curve data layout.
  *
  * Z-ordering (Morton codes) is the standard multi-dimensional clustering
  * trick for data skipping at scale: sort/partition 100 TB by the
  * interleaved bits of two (or more) filter columns and min/max stats on
  * each file prune BOTH dimensions, where a lexicographic sort prunes only
  * the leading one. Everything here is plain integer Column arithmetic —
  * codegen'd, engine-portable, exactly reproducible.
  */
object Bits {

  /** Spread the low 16 bits of `x` so one zero bit separates each data bit
    * (0b1111 -> 0b01010101). The classic mask-shift cascade, kept as Column
    * ops on BIGINT so any SQL engine replays it verbatim.
    */
  def spread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code interleaving the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions).
    */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
