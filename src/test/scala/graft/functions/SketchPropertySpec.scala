package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the driver-free (pure JVM) halves of the sketch
 * family and the top-k buffer — brute-force reference comparisons on
 * random inputs, no SparkSession needed.
 */
class SketchPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val anyLong = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  test("bloom positions are always in range and depend only on the documented bits") {
    checkProp(Prop.forAll(anyLong, Gen.choose(0, 15)) { (h, i) =>
      val m = 1024
      val pos = BloomFilterAgg.position(h, i, m)
      val masked = BloomFilterAgg.position(h & 0x3FFFFFFFFFFFFFFFL, i, m)
      pos >= 0 && pos < m && pos == masked
    })
  }

  test("CMS built from any insertion split never underestimates, and exact when width is huge") {
    val items = Gen.listOfN(60, Gen.choose(0L, 30L))
    checkProp(Prop.forAll(items, Gen.choose(1, 59)) { (xs, cut) =>
      val agg = new CountMinAgg(512, 3)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)((buf, x) => agg.reduce(buf, Long.box(x))),
        b.foldLeft(agg.zero)((buf, x) => agg.reduce(buf, Long.box(x))))
      val whole = xs.foldLeft(agg.zero)((buf, x) => agg.reduce(buf, Long.box(x)))
      val exact = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      def est(buf: Array[Long], h: Long): Long =
        (0 until 3).map(i => buf(i * 512 + BloomFilterAgg.position(h, i, 512).toInt)).min
      merged.sameElements(whole) &&
        exact.forall { case (h, c) => est(merged, h) >= c }
    })
  }

  test("TopKAgg equals sort-take on random doubles including NaN and -0.0") {
    val score = Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.const(Double.NaN), Gen.const(-0.0), Gen.const(0.0),
      Gen.const(Double.PositiveInfinity), Gen.const(Double.NegativeInfinity))
    val rows = Gen.listOfN(40, Gen.zip(score, Gen.choose(0L, 1000L)))
    checkProp(Prop.forAll(rows, Gen.choose(1, 12), Gen.choose(1, 39)) { (xs, k, cut) =>
      val agg = new TopKAgg(k)
      val (a, b) = xs.splitAt(cut)
      def build(part: List[(Double, Long)]) =
        part.foldLeft(agg.zero)((buf, x) => agg.reduce(buf, (Double.box(x._1), Long.box(x._2))))
      val merged = agg.merge(build(a), build(b)).toSeq
      // reference: total order (score DESC with NaN greatest / -0.0==0.0, id ASC)
      val sorted = xs.map { case (s, id) => (if (s == 0.0) 0.0 else s, id) }
        .sortWith { case ((s1, i1), (s2, i2)) =>
          val c = java.lang.Double.compare(s1, s2)
          c > 0 || (c == 0 && i1 < i2)
        }.take(k)
      // compare via bit patterns: plain == would make NaN != NaN
      def bits(s: Seq[(Double, Long)]) =
        s.map { case (d, id) => (java.lang.Double.doubleToLongBits(d), id) }
      bits(merged) == bits(sorted)
    })
  }
}
