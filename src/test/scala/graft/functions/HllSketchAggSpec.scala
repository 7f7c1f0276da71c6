package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HllSketchAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL: ~1.04/sqrt(m) accuracy, partition- and duplicate-invariant") {
    val n = 5000
    val keys = (1 to n).map(i => s"key:$i").toDF("key")
      .select(TextFunctions.fnv1a64_mix($"key").as("h"))
    def est(parts: Int) = keys.repartition(parts)
      .agg(HllSketchAgg.hll_distinct($"h", 6)).head().getDouble(0)
    val e = est(4)
    // raw estimator at m=64: typical error 13%, pin a loose 3-sigma band
    assert(math.abs(e - n) / n < 0.4, s"estimate $e for $n distinct")
    // registers are per-bucket maxima — a set property of the data —
    // so the estimate must be bit-identical under any partitioning
    assert(est(1) == e && est(13) == e, "estimate depends on partitioning")
    // ...and under duplication (max is idempotent)
    val dup = keys.union(keys).agg(HllSketchAgg.hll_distinct($"h", 6)).head().getDouble(0)
    assert(dup == e, "duplicates moved a register")
    // wider sketch, tighter estimate — at m=256 the corpus still sits in
    // the raw regime (n ≫ 2.5·m), so the ~1.04/√m error law applies
    // (m=4096 would NOT: below 2.5·m the uncorrected raw estimator
    // overestimates — the documented reason corrections exist)
    val e8 = keys.agg(HllSketchAgg.hll_distinct($"h", 8)).head().getDouble(0)
    assert(math.abs(e8 - n) / n < 0.2, s"m=256 estimate $e8 for $n distinct")
  }

  test("HLL: rank/bucket geometry matches the documented bit split") {
    // hand-built hashes: bucket = top 6 bits, rank = nlz of the low-58
    // field + 1. h = bucket<<58 | (1L << (58 - rank)) gives exactly rank
    // leading zeros in the field.
    val agg = new HllSketchAgg(6)
    var buf = agg.zero
    buf = agg.reduce(buf, (3L << 58) | (1L << 57)) // bucket 3, rank 1
    buf = agg.reduce(buf, (3L << 58) | (1L << 50)) // bucket 3, rank 8
    buf = agg.reduce(buf, 5L << 58)                // bucket 5, field 0 → rank 59
    buf = agg.reduce(buf, null)                    // ignored
    assert(buf(3) == 8 && buf(5) == 59 && buf(0) == 0)
    // merge = elementwise max
    var other = agg.zero
    other = agg.reduce(other, (3L << 58) | (1L << 55)) // bucket 3, rank 3
    val merged = agg.merge(buf.clone(), other)
    assert(merged(3) == 8 && merged(5) == 59)
    // finish: exact harmonic sum — empty sketch gives alpha*m (the raw
    // estimator's documented no-data value; corrections are out of scope)
    val empty = agg.finish(agg.zero)
    assert(math.abs(empty - 0.709 * 64.0) < 1e-9, s"empty-sketch estimate $empty")
  }
}
