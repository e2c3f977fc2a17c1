package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch as a reusable typed [[Aggregator]] —
  * the grouped/composable form of q78's declarative sketch: 64 one-byte
  * registers per group, mergeable by element-wise max, so map-side partial
  * aggregation ships 64 bytes per (partition, group) across the exchange
  * however large the input. Use it wherever `count(distinct x)` per group
  * would force an expand + full key shuffle.
  *
  * Numerically identical to the declarative q78 chain (and its DuckDB
  * oracle): input is the md5-derived 32-bit hash ([[TextFns.h32]]), the
  * register index is the low 6 bits, the rank is the bit-length complement
  * of the remaining 26 bits (exact integer ops), and the harmonic-mean
  * estimate sums 64 dyadic rationals — exact in double under any register
  * order, so the result does not depend on partitioning.
  */
object Hll {
  /** Register count (2^6). Standard error ≈ 1.04/√m ≈ 13%. */
  val m: Int = 64
  /** α₆₄ bias constant (Flajolet et al. 2007, m = 64). */
  val alpha: Double = 0.709

  final case class HllAgg() extends Aggregator[Long, Array[Byte], Double] {
    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(regs: Array[Byte], h: Long): Array[Byte] = {
      val bucket = (h & (m - 1)).toInt
      val w = h >>> 6
      // 27 - bitLength(w): the same exact-integer rank as
      // `27 - length(bin(w))` in the q78 SQL form
      val rho =
        if (w == 0L) 27
        else 27 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho.toByte
      regs
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) {
        if (b(i) > a(i)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(regs: Array[Byte]): Double = {
      // fixed index order; terms are powers of two, so the sum is exact
      // regardless of how partials merged
      var s = 0.0
      var i = 0
      while (i < m) {
        s += java.lang.Math.pow(2.0, -regs(i).toDouble)
        i += 1
      }
      alpha * m * m / s
    }

    override def bufferEncoder: Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** `approxDistinct(h)` aggregate column over a 32-bit-hash column
    * (use [[TextFns.h32]] to build one): the HLL cardinality estimate. */
  def approxDistinct(h: Column): Column = udaf(HllAgg()).apply(h)
}
