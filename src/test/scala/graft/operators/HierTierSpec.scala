package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.{CentroidFunctions, IvfOps}

/** The HIERARCHICAL (two-level) quantizer tier's contract: with enough
  * coarse probes it IS the flat expression tier (answer-identical,
  * spec-pinned here); with fewer it trades assignment/probe exactness
  * for a √nlist-fold cut in per-row quantizer work. The fine→coarse
  * ownership map is a derived artifact (argmax, ties → low kid) so the
  * oracle can re-derive it; empty coarse cells are never probed. */
class HierTierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"${SparkTestSession.sf001}/embeddings.parquet")
  lazy val fine32 = Similarity.kmeansCentroidsByExpr(emb, nlist = 32, iters = 2)
  lazy val coarse4 = Similarity.kmeansLocalCentroids(fine32, 4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("cprobe = ncoarse: hierarchical tier IS the flat expression tier") {
    // all (owned) coarse cells probed -> the fine candidate domain is
    // the whole matrix, so assignment, probes, serving and the eval
    // shape must all equal the flat tier row-for-row
    val hAss = Similarity.hierAssignedByExpr(coarse4, fine32, emb, cprobe = 4)
      .select("nbr_id", "__cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val fAss = Similarity.ivfAssignedByExpr(fine32, emb)
      .select("nbr_id", "__cid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(hAss == fAss)
    val q = emb.where($"vec_id" < 8)
    assert(rows(Similarity.hierTopKByExpr(coarse4, fine32, emb, q, k = 10, cprobe = 4))
      == rows(Similarity.ivfTopKByExpr(fine32, emb, q, k = 10)))
    assert(rows(Similarity.hierTopKByExpr(coarse4, fine32, emb, emb, k = 1,
        cprobe = 4, broadcastQueries = false))
      == rows(Similarity.ivfTopKByExpr(fine32, emb, emb, k = 1, broadcastQueries = false)))
  }

  test("fine→coarse ownership: argmax ties → LOW kid; duplicated coarse leaves the twin unowned and unprobed") {
    // duplicate coarse cells: every fine centroid scores identically
    // against both, so ownership must land on kid 0 (ties -> low), the
    // twin owns nothing, and NO probe may ever select it
    val dupCoarse = Array(coarse4(0), coarse4(0))
    val f2c = IvfOps.fineToCoarse(dupCoarse, fine32)
    assert(f2c.forall(_ == 0))
    val probes = emb.where($"vec_id" < 6)
      .select($"vec_id",
        CentroidFunctions.hier_probes($"embedding", dupCoarse, fine32, 2, 4).as("p"))
      .collect().map(_.getSeq[Int](1))
    // with only ONE owned cell, cprobe=2 still probes just it — and the
    // fine selection over its (full) list equals the flat rule
    val flat = emb.where($"vec_id" < 6)
      .select($"vec_id", CentroidFunctions.centroid_probes($"embedding", fine32, 4).as("p"))
      .collect().map(_.getSeq[Int](1))
    probes.zip(flat).foreach { case (h, f) => assert(h == f) }
  }

  test("probe tie rule: duplicated FINE centroids in one cell -> higher cid wins (the shared insertion buffer)") {
    val dupFine = Array(fine32(0), fine32(0), fine32(1), fine32(1))
    val coarse = Similarity.kmeansLocalCentroids(dupFine, 1) // one cell owns all
    val got = emb.where($"vec_id" < 6)
      .select($"vec_id",
        CentroidFunctions.hier_probes($"embedding", coarse, dupFine, 1, 1).as("p"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).head))
    // exact score ties between (0,1) and between (2,3): the winner is
    // always the HIGHER cid of its duplicated pair
    assert(got.forall { case (_, cid) => cid == 1 || cid == 3 })
    // and hierarchical ASSIGNMENT keeps the opposite rule (ties -> low)
    val ass = emb.where($"vec_id" < 6)
      .select($"vec_id",
        CentroidFunctions.hier_argmax($"embedding", coarse, dupFine, 1).as("c"))
      .collect().map(_.getInt(1))
    assert(ass.forall(c => c == 0 || c == 2))
  }

  test("empty coarse cells are never probed: a query nearest an empty cell still gets answers") {
    // dim-2 toy geometry: coarse cell 2 points at (-1,0) where no fine
    // centroid lives, so it owns nothing; a query at (-1, 0.1) must
    // probe owned cells only and still return its top-k
    val coarse = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val fine = Array(Array(1.0, 0.1), Array(0.9, 0.2), Array(0.1, 1.0), Array(0.2, 0.9))
    assert(IvfOps.fineToCoarse(coarse, fine).forall(_ < 2))
    val corpus = Seq((1L, Seq(1.0, 0.05)), (2L, Seq(0.05, 1.0)), (3L, Seq(0.7, 0.7)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Seq(-1.0, 0.1))).toDF("vec_id", "embedding")
    val got = Similarity.hierTopKByExpr(coarse, fine, corpus, queries, k = 3,
      cprobe = 1, nprobe = 4)
    assert(got.count() >= 1) // probed an OWNED cell despite the nearer empty one
  }

  test("local coarse trainer: deterministic, shape-preserving, mirrors lloydRounds semantics") {
    val a = Similarity.kmeansLocalCentroids(fine32, 4)
    val b = Similarity.kmeansLocalCentroids(fine32, 4)
    assert(a.length == 4 && a(0).length == fine32(0).length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    // iters=0 returns the init verbatim: the first k points in index
    // order — the same seed rule as the distributed trainers
    val init = Similarity.kmeansLocalCentroids(fine32, 4, iters = 0)
    init.zip(fine32.take(4)).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("hier trainer: cprobe covering every coarse cell degenerates to the flat trainer bit-for-bit") {
    // cprobe = nlist -> coarseListsFor(nlist, nlist) = nlist coarse
    // cells, all probed -> hier assignment IS flat argmax each round
    val flat = Similarity.kmeansCentroidsByExpr(emb, nlist = 32, iters = 2)
    val hier = Similarity.kmeansCentroidsByHier(emb, nlist = 32, iters = 2, cprobe = 32)
    hier.zip(flat).foreach { case (a, b) => assert(a.sameElements(b)) }
    // the approximate (cprobe=4) trainer: deterministic, shape-preserving
    val a = Similarity.kmeansCentroidsByHier(emb, nlist = 32, iters = 2)
    val b = Similarity.kmeansCentroidsByHier(emb, nlist = 32, iters = 2)
    assert(a.length == 32 && a(0).length == flat(0).length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("coarseListsFor: the sqrt-law coarse count, pow2 grid, clamped to nlist") {
    assert(Similarity.coarseListsFor(256, 4) == 32) // sqrt(1024) = 32 exactly
    assert(Similarity.coarseListsFor(1024, 4) == 64) // sqrt(4096) = 64
    assert(Similarity.coarseListsFor(8192, 4) == 256) // sqrt(32768) ≈ 181 -> 2^8
    assert(Similarity.coarseListsFor(2, 4) == 2) // clamped to nlist
  }

  test("scan-local plan: no centroid joins, no literal structs — the two matrices ride as Literals") {
    val fine = Similarity.kmeansCentroidsByExpr(emb, nlist = 64, iters = 2)
    val coarse = Similarity.kmeansLocalCentroids(fine, Similarity.coarseListsFor(64))
    val served = Similarity.hierTopKByExpr(coarse, fine, emb,
      emb.where($"vec_id" < 3), k = 10)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("array_sort"), "literal probe structs leaked in")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "a centroid-table crossjoin leaked in — the hierarchical tier is scan-local")
    val got = rows(served)
    val byQ = got.groupBy(_._1)
    assert(byQ.size == 3)
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_._3).toList.sorted
      assert(ranks == (1 to ranks.size).toList && ranks.size <= 10, s"query $q ranks $ranks")
    }
  }
}
