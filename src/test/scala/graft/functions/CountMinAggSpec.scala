package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CountMinAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val orders = spark.read.parquet(s"${SparkTestSession.sf001}/orders.parquet")

  private val (w, d) = (512, 3)

  private def keyed = orders.select($"o_custkey",
    TextFunctions.fnv1a64_mix(concat(lit("cust:"), $"o_custkey")).as("h"))

  test("estimates never underestimate and are within the CMS error bound") {
    val cms = keyed.agg(CountMinAgg.cms_agg($"h", w, d).as("cms"))
    val n = orders.count()
    val rows = keyed.groupBy($"o_custkey")
      .agg(count(lit(1)).as("exact"), min($"h").as("h"))
      .crossJoin(broadcast(cms))
      .select($"exact", CountMinAgg.estimate($"cms", $"h", w, d).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (exact, est) =>
      assert(est >= exact, s"CMS must never underestimate: $est < $exact")
    }
    // standard bound: overestimate ≤ e/width · N with prob 1-e^-depth;
    // allow generous slack — this pins sanity, not tightness
    val bound = math.ceil(math.E / w * n).toLong * 8
    assert(rows.forall { case (exact, est) => est - exact <= bound },
      s"overestimates exceed ${bound}")
  }

  test("sketch is partitioning-invariant (counter adds commute)") {
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.agg(CountMinAgg.cms_agg($"h", w, d)).collect()(0).getSeq[Long](0)
    assert(sketch(keyed) == sketch(keyed.repartition(11)))
  }

  test("counter positions reuse the Bloom double-hashing scheme") {
    val h = graft.core.TextHash.fnv1a64Mixed("cust:7".getBytes("UTF-8"))
    val agg = new CountMinAgg(w, d)
    val b = agg.reduce(agg.zero, Long.box(h))
    (0 until d).foreach { i =>
      assert(b(i * w + BloomFilterAgg.position(h, i, w).toInt) == 1L)
    }
    assert(b.sum == d)
  }
}
