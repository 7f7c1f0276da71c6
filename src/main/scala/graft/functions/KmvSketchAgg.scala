package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * KMV (k-minimum-values) distinct-count sketch over 64-bit hashes — the
 * oracle-checkable counterpart to HLL: because the input hash
 * ([[TextFunctions.fnv1a64_mix]] — the MIXED variant; raw FNV's
 * non-uniform high bits bias the estimator 6× on sequential keys) and
 * the estimator (k-th smallest distinct hash, unsigned) are both
 * deterministic and SQL-expressible, the whole approximate answer
 * hash-matches a DuckDB recompute, which no HLL implementation pair
 * ever will. NULL hashes are ignored, matching builtin aggregates.
 *
 * Buffer: the ≤ k smallest DISTINCT hashes in unsigned order (≤ 2 KiB
 * for k=256). `reduce` touches the array only when the hash beats the
 * current k-th minimum, so the per-row cost collapses to a comparison
 * once the sketch saturates; `merge` is a sorted-merge + truncate —
 * partial-aggregating like any sketch, no dedup shuffle. Estimator:
 * exact size while |buffer| < k, else (k-1) · 2⁶⁴ / kth_min (standard
 * KMV; relative error ≈ 1/√k ≈ 6% at k=256).
 */
class KmvSketchAgg(k: Int) extends Aggregator[java.lang.Long, Array[Long], Double] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return b
    val h = boxed.longValue()
    val n = b.length
    if (n == k && java.lang.Long.compareUnsigned(h, b(n - 1)) >= 0) return b
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Long.compareUnsigned(b(mid), h) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && b(lo) == h) return b // already present
    val out = new Array[Long](math.min(n + 1, k))
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = h
    System.arraycopy(b, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length) { val x = a(i); i += 1; x }
        else if (i >= a.length) { val x = b(j); j += 1; x }
        else {
          val c = java.lang.Long.compareUnsigned(a(i), b(j))
          if (c <= 0) { val x = a(i); i += 1; if (c == 0) j += 1; x }
          else { val x = b(j); j += 1; x }
        }
      out(o) = v
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(b: Array[Long]): Double =
    if (b.length < k) b.length.toDouble
    else {
      // exact unsigned→double conversion (correctly rounded), matching
      // DuckDB's CAST(HUGEINT AS DOUBLE) of the same value
      val kth = new java.math.BigDecimal(
        new java.math.BigInteger(java.lang.Long.toUnsignedString(b(k - 1)))).doubleValue()
      (k - 1).toDouble * 18446744073709551616.0 / kth
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketchAgg {
  /** Column form: `kmv_distinct(hashCol, k)` — estimated distinct count
    * of the hash values (pair with [[TextFunctions.fnv1a64_mix]] for an
    * oracle-recomputable pipeline; see the class doc for why the raw
    * FNV hash must not be used here). */
  def kmv_distinct(hash: Column, k: Int = 256): Column =
    org.apache.spark.sql.functions.udaf(new KmvSketchAgg(k)).apply(hash)
}
