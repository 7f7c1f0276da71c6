package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Count-Min frequency sketch over 64-bit hashes — the frequency member
 * of the deterministic sketch family ([[BloomFilterAgg]] membership,
 * [[KmvSketchAgg]] distinct count): a depth×width counter matrix where
 * each row i increments column `position(h, i, width)` — the SAME
 * Kirsch–Mitzenmacher double-hashed positions as the Bloom filter, so
 * one hashing scheme drives both sketches. A point estimate is the MIN
 * over the depth rows' counters: always ≥ the true count, within
 * ε·N (ε ≈ e/width) with probability 1-δ (δ ≈ e^-depth).
 *
 * Everything is integer and order-independent (counter adds commute;
 * `merge` is element-wise sum), so the whole sketch — and every
 * estimate read from it, overestimates included — is reproducible
 * bit-for-bit by an independent SQL engine. The sketch is
 * depth·width·8 bytes regardless of row count: at 100 TB it builds in
 * one scan with map-side partial aggregation (one matrix per
 * partition, summed in the single-row shuffle) and broadcasts to
 * wherever estimates are needed.
 */
class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(width > 0, s"width must be positive, got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width.toLong * depth <= Int.MaxValue,
    s"width*depth must fit an array, got ${width.toLong * depth}")

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(b: Array[Long], boxed: java.lang.Long): Array[Long] = {
    if (boxed == null) return b
    var i = 0
    while (i < depth) {
      b(i * width + BloomFilterAgg.position(boxed.longValue(), i, width).toInt) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  /** Column form: `cms_agg(hashCol, width, depth)` → array<long> of
    * depth×width row-major counters (pair with
    * [[TextFunctions.fnv1a64_mix]] for an oracle-recomputable sketch). */
  def cms_agg(hash: Column, width: Int, depth: Int): Column =
    org.apache.spark.sql.functions.udaf(new CountMinAgg(width, depth)).apply(hash)

  /** Point estimate of hash column `h` against sketch column `cms`:
    * min over the depth rows. Pure integer column arithmetic — runs
    * inside codegen on the probe side. INVARIANT: width/depth MUST
    * match the [[cms_agg]] the sketch was built with — a mismatch
    * reads unrelated (or out-of-range → NULL) counters and the
    * never-underestimate guarantee is void; the sketch cannot carry
    * its shape, so the caller owns this (the a48 query derives both
    * from one pair of vals). */
  def estimate(cms: Column, h: Column, width: Int, depth: Int): Column = {
    import org.apache.spark.sql.functions._
    require(width > 0 && depth >= 1 && width.toLong * depth <= Int.MaxValue,
      s"invalid sketch shape ${width}x$depth")
    val (u1, u2) = BloomFilterAgg.doubleHashParams(h)
    (0 until depth).map { i =>
      val pos = (u1 + lit(i.toLong) * u2) % lit(width.toLong)
      element_at(cms, (lit(i.toLong * width) + pos).cast("int") + 1)
    }.reduce((a, b) => least(a, b))
  }
}
