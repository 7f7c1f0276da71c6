package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def refZ(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  private def zOf(pairs: Seq[(Int, Int)]): Seq[Long] =
    pairs.toDF("x", "y")
      .select(ZOrder.zkey($"x".cast("long"), $"y".cast("long")).as("z"))
      .collect().map(_.getLong(0)).toSeq

  test("golden vectors") {
    val in = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (0xffff, 0xffff))
    assert(zOf(in) == Seq(0L, 1L, 2L, 3L, 0x27L, 0xffffffffL))
  }

  test("matches the bit-by-bit reference interleave on random 16-bit pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(65536), rnd.nextInt(65536)))
    assert(zOf(pairs) == pairs.map { case (x, y) => refZ(x, y) })
  }

  test("locality: a shared z-prefix of 2k bits confines both dims to a 2^(16-k) tile") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val zs = zOf(pairs)
    val k = 10 // cell = top 2k z-bits → tile side 2^(16-k) = 64
    pairs.zip(zs).groupBy { case (_, z) => z >> (2 * (16 - k)) }.foreach {
      case (_, members) =>
        val xs = members.map(_._1._1); val ys = members.map(_._1._2)
        assert(xs.max - xs.min < 64 && ys.max - ys.min < 64)
    }
  }

  test("z-order layout write beats a 1-D sort at bounding both dims per file") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(4000)((rnd.nextInt(65536), rnd.nextInt(65536)))
      .toDF("x", "y").select($"x".cast("long"), $"y".cast("long"))
    val tmp = System.getProperty("java.io.tmpdir")
    // the layout under test vs the naive alternative: sort by x only
    ZOrder.zorderWrite(df, $"x", $"y", s"$tmp/graft-zspec-z", outputPartitions = 16)
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/graft-zspec-x")
    // per-file worst-dimension span — the quantity footer-stat pruning
    // cares about: a predicate on either dim skips a file iff that
    // dim's span misses it. Files straddling a high quadtree boundary
    // can individually go wide, but ON AVERAGE z-clustered files bound
    // both dims far tighter than x-sorted files bound y (those span
    // the whole domain).
    def avgWorstSpan(path: String): Double = {
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect()
      assert(rows.length >= 8)
      rows.map(r => math.max(r.getLong(2) - r.getLong(1), r.getLong(4) - r.getLong(3)))
        .sum.toDouble / rows.length
    }
    val z = avgWorstSpan(s"$tmp/graft-zspec-z")
    val x = avgWorstSpan(s"$tmp/graft-zspec-x")
    assert(z < x / 2, s"z-layout avg worst-dim span $z not < half of x-sorted $x")
  }
}
