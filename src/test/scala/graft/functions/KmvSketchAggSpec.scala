package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KmvSketchAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("KMV: exact below k, ~1/sqrt(k) accuracy above, partition-invariant") {
    val n = 5000
    val keys = (1 to n).map(i => s"key:$i").toDF("key")
      .select(TextFunctions.fnv1a64_mix($"key").as("h"))
    def est(parts: Int) = keys.repartition(parts)
      .agg(KmvSketchAgg.kmv_distinct($"h", 256)).head().getDouble(0)
    val e = est(4)
    assert(math.abs(e - n) / n < 0.2, s"estimate $e for $n distinct")
    // the k smallest distinct hashes are a set property of the data —
    // the estimate must be bit-identical under any partitioning
    assert(est(1) == e && est(13) == e, "estimate depends on partitioning")
    val small = (1 to 100).map(i => s"k:$i").toDF("key")
      .select(TextFunctions.fnv1a64_mix($"key").as("h"))
    assert(small.agg(KmvSketchAgg.kmv_distinct($"h")).head().getDouble(0) == 100.0)
    // duplicates must not inflate the exact-path count
    assert(small.union(small).agg(KmvSketchAgg.kmv_distinct($"h"))
      .head().getDouble(0) == 100.0)
  }
}
