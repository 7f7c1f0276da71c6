package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The centroid-TABLE serving tier's contract: answer-identical to the
  * literal-expression path wherever both can run (nlist ≤ the literal
  * cap), structurally free of per-centroid literals so nlist can grow
  * past it. The equivalence is the whole point — the table tier exists
  * to lift an ENGINEERING bound (ivfListsFor maxBits), not to change
  * any answer. */
class IvfTableTierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"${SparkTestSession.sf001}/embeddings.parquet")
  lazy val cents16 = Similarity.kmeansCentroids(emb, nlist = 16, iters = 2)
  lazy val cdf16 = Similarity.centroidsDf(spark, cents16)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("assignment: table-join argmax equals the literal struct argmax (ties -> lowest cid)") {
    val lit16 = Similarity.ivfAssigned(cents16, emb)
      .select("nbr_id", "__cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val tab16 = Similarity.ivfAssignedByTable(cdf16, emb)
      .select("nbr_id", "__cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(tab16 == lit16)
  }

  test("serving: table tier equals the literal tier row-for-row at nlist=16") {
    val q = emb.where($"vec_id" < 8)
    assert(rows(Similarity.ivfTopKByTable(cdf16, emb, q, k = 10)) ==
      rows(Similarity.ivfTopKWith(cents16, emb, q, k = 10)))
  }

  test("eval shape: shuffled-query table tier equals the literal tier (corpus-sized query side)") {
    // s80's shape — every vector a query, broadcastQueries = false on
    // both paths; the table tier's probe join must land on the same
    // top-1 neighbors
    val lit = rows(Similarity.ivfTopKWith(cents16, emb, emb, k = 1, broadcastQueries = false))
    val tab = rows(Similarity.ivfTopKByTable(cdf16, emb, emb, k = 1, broadcastQueries = false))
    assert(tab == lit)
  }

  test("probe selection: top-nprobe per query matches the literal reverse-sort rule (ties -> higher cid)") {
    // duplicate centroids force exact score ties; at nprobe=1 the tie
    // decides MEMBERSHIP: the table tier's TopKAgg(-cid) order must
    // pick the HIGHER cid of the closer duplicate pair, as the literal
    // path's reverse(array_sort) slice and the oracles' ORDER BY s
    // DESC, cid DESC do
    val dup = Array(cents16(0), cents16(0), cents16(1), cents16(1))
    val dupDf = Similarity.centroidsDf(spark, dup)
    val q = emb.where($"vec_id" < 6)
    val tab = Similarity.probeCidsByTable(q, dupDf, nprobe = 1, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // the literal rule, per query, via the driver-side selector that
    // encodes it (cosine DESC, cid DESC)
    val probedLit = q.select($"vec_id", $"embedding").collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), Similarity.literalProbeCids(dup, Seq(v), nprobe = 1).head)
    }.toSet
    assert(tab == probedLit)
    assert(tab.forall { case (_, cid) => cid == 1 || cid == 3 },
      s"score ties must resolve to the higher duplicate cid: $tab")
  }

  test("nlist=128: table tier trains and serves past the literal cap, no literal-struct plan") {
    val cents = Similarity.kmeansCentroidsByTable(emb, nlist = 128, iters = 2)
    assert(cents.length == 128)
    val served = Similarity.ivfTopKByTable(Similarity.centroidsDf(spark, cents),
      emb, emb.where($"vec_id" < 3), k = 10)
    val plan = served.queryExecution.executedPlan.toString
    // the literal tier's signature operator — a scan-stage array_sort
    // over one struct PER CENTROID — must be absent: probe selection
    // rides the broadcast table join + TopKAgg instead
    assert(!plan.contains("array_sort"), s"literal probe structs leaked into the table tier:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "centroid table should ride a broadcast join")
    val got = rows(served)
    assert(got.size == 30 && got.groupBy(_._1).forall(_._2.size == 10))
  }

  test("table-trained kmeans matches literal-trained kmeans at nlist=16") {
    // same seeds, same update fold, assignment equivalence proven above
    // -> the trainers must agree exactly (both aggregate per-(cid, pos)
    // sums through the same one exchange)
    val tab = Similarity.kmeansCentroidsByTable(emb, nlist = 16, iters = 2)
    assert(tab.length == cents16.length)
    tab.zip(cents16).foreach { case (a, b) => assert(a.sameElements(b)) }
  }
}
