package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Raw HyperLogLog distinct-count sketch over 64-bit hashes — the
 * oracle-checkable HLL (the builtin `approx_count_distinct` pair a31
 * can never hash-match a DuckDB oracle: its xxhash64 seeding and bias
 * tables are engine-private). Here every step is deterministic and
 * SQL-expressible on the [[TextFunctions.fnv1a64_mix]] hash:
 *
 *  - bucket  = top `p` bits of the hash (m = 2^p registers);
 *  - rank    = leading zeros of the remaining W = 64−p bit field + 1
 *              (W+1 when the field is all zeros);
 *  - register = max rank seen per bucket (idempotent — duplicate
 *              hashes cannot move it, which is the whole trick);
 *  - estimate = α_m · m² / Σ 2^(−reg), the Flajolet et al. 2007 raw
 *              estimator, evaluated EXACTLY: the harmonic sum is the
 *              integer Σ 2^(Rmax−reg) (Rmax = W+1, so every term and
 *              the ≤ m·2^Rmax total are exact), converted once to a
 *              correctly-rounded double — the same value DuckDB's
 *              CAST(HUGEINT AS DOUBLE) produces — then one literal
 *              multiply chain and one IEEE division shared verbatim
 *              with the oracle SQL.
 *
 * Deliberately RAW: no linear-counting / long-range corrections — both
 * branches need libm `ln`, whose last-ulp behavior is not contracted
 * across engines, and the gate's cardinalities (n ≫ 2.5·m at m = 64)
 * sit in the regime where the corrections are identity anyway. The
 * accuracy spec pins the estimate against the exact count; relative
 * error ≈ 1.04/√m.
 *
 * Buffer: m bytes (m = 64 → 64 B — 32× smaller than the k=256 KMV
 * buffer), merged by elementwise max — associative, commutative,
 * idempotent, so the answer is partition- and retry-invariant. NULL
 * hashes are ignored, matching builtin aggregates.
 */
class HllSketchAgg(p: Int) extends Aggregator[java.lang.Long, Array[Byte], Double] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p
  private val w = 64 - p // hashed-field width once the bucket bits are gone

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], boxed: java.lang.Long): Array[Byte] = {
    if (boxed == null) return b
    val h = boxed.longValue()
    val bucket = (h >>> w).toInt
    // top p bits are zero after the mask, so nlz ≥ p and rank ∈ [1, w+1]
    val rank = java.lang.Long.numberOfLeadingZeros(h & (-1L >>> p)) - p + 1
    if (rank > b(bucket)) b(bucket) = rank.toByte
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[Byte]): Double = {
    val rmax = w + 1
    var s = java.math.BigInteger.ZERO
    var i = 0
    while (i < m) {
      s = s.add(java.math.BigInteger.ONE.shiftLeft(rmax - b(i)))
      i += 1
    }
    // exact integer→double conversions (correctly rounded), matching
    // DuckDB's CAST(HUGEINT AS DOUBLE) of the same values
    val sD = new java.math.BigDecimal(s).doubleValue()
    val pow2Rmax = java.math.BigDecimal.valueOf(2).pow(rmax).doubleValue()
    val md = m.toDouble
    HllSketchAgg.alpha(m) * (md * md) * pow2Rmax / sD
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object HllSketchAgg {
  /** The Flajolet et al. 2007 α_m constants (small-m literals, then the
    * asymptotic formula). The oracle inlines the same literal, so the
    * multiply chain is bit-identical across engines. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** Column form: `hll_distinct(hashCol, p)` — estimated distinct count
    * of the hash values, m = 2^p registers (pair with
    * [[TextFunctions.fnv1a64_mix]]; raw FNV's non-uniform high bits
    * would bias both the bucket split and the rank geometry). */
  def hll_distinct(hash: Column, p: Int = 6): Column =
    org.apache.spark.sql.functions.udaf(new HllSketchAgg(p)).apply(hash)
}
