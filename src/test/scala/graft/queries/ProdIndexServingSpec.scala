package graft.queries

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Similarity

/**
 * The PRODUCTION-nlist persisted serving arc (s90/s91/s93): export
 * artifacts, tier equivalences over the persisted index, and the
 * nprobe-for-recall derivation contract.
 */
class ProdIndexServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir = SparkTestSession.sf0001
  private lazy val root = PipelineQueries.ensureIvfProdIndexExport(spark, dir)
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("export persists the hive-partitioned index plus BOTH quantizer matrices") {
    val nlist = PipelineQueries.prodNlist
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val coarse = PipelineQueries.readCentroids(spark, s"$root/coarse", idCol = "kid")
    assert(fine.length === nlist)
    assert(coarse.length === Similarity.coarseListsFor(nlist))
    // the layout the serving scans prune: one hive partition per list
    val listDirs = Option(Paths.get(root, "index").toFile.listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("__cid="))
    assert(listDirs > 1 && listDirs <= nlist,
      s"expected __cid= hive partitions, found $listDirs")
    assert(Files.exists(Paths.get(root, "_SUCCESS")))
  }

  test("persisted fine matrix round-trips the deterministic trainer bit-for-bit") {
    // doubles round-trip parquet exactly and the expression-tier
    // trainer is a pure function of the corpus — so a read-back matrix
    // that differs from a same-session retrain means the export wrote
    // a different model than it claims
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val retrained = Similarity.kmeansCentroidsByExpr(emb,
      nlist = PipelineQueries.prodNlist, iters = 2)
    assert(fine.length === retrained.length)
    fine.zip(retrained).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"centroid $i drifted on the round-trip")
    }
    // the coarse matrix is likewise a pure function of the fine one
    val coarse = PipelineQueries.readCentroids(spark, s"$root/coarse", idCol = "kid")
    val recoarse = Similarity.kmeansLocalCentroids(fine,
      Similarity.coarseListsFor(PipelineQueries.prodNlist))
    coarse.zip(recoarse).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"coarse centroid $i drifted on the round-trip")
    }
  }

  test("hier serving over the persisted index degenerates to flat at cprobe = ncoarse") {
    // with every owned coarse cell probed, the two-level query walk
    // sees every fine list the flat walk sees — answers must be
    // row-identical over the SAME persisted (flat-assigned) index
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val coarse = PipelineQueries.readCentroids(spark, s"$root/coarse", idCol = "kid")
    val idx = spark.read.parquet(s"$root/index")
    val q = emb.where($"vec_id" < 5)
    val flat = Similarity.ivfTopKOnIndexByExpr(fine, idx, q, k = 10)
      .select($"query_id", $"nbr_id", $"rank").orderBy("query_id", "rank").collect()
    val hier = Similarity.hierTopKOnIndexByExpr(coarse, fine, idx, q, k = 10,
        cprobe = coarse.length)
      .select($"query_id", $"nbr_id", $"rank").orderBy("query_id", "rank").collect()
    assert(flat.nonEmpty && flat.toSeq === hier.toSeq)
  }

  test("nprobeForRecall: derived config holds its target and reports honest recall") {
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val q = emb.where($"vec_id" < 5)
    val cfg = Similarity.nprobeForRecall(emb, q, fine, k = 10, targetRecall = 0.7)
    assert(cfg.recall >= 0.7, s"derived nprobe=${cfg.nprobe} measured ${cfg.recall}")
    assert(cfg.nprobe >= 1 && cfg.nprobe <= fine.length)
    // the derivation picks the SMALLEST doubling step that holds the
    // target: the previous step (half the probes) must fall short —
    // otherwise the loop overshot
    if (cfg.nprobe > 1) {
      val prev = Similarity.ivfTopKByExpr(fine, emb, q, k = 10, nprobe = cfg.nprobe / 2)
        .select($"query_id", $"nbr_id")
      val hits = Similarity.bruteForceTopK(emb, q, k = 10)
        .select($"query_id", $"nbr_id")
        .join(prev, Seq("query_id", "nbr_id")).count()
      assert(hits.toDouble / 50 < 0.7,
        s"nprobe=${cfg.nprobe / 2} already held the target; derivation overshot")
    }
  }

  test("cprobeForRecall: the coarse knob holds the target or stops at the flat ceiling") {
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val coarse = PipelineQueries.readCentroids(spark, s"$root/coarse", idCol = "kid")
    val q = emb.where($"vec_id" < 5)
    // nprobe=16 is the flat knob s93 derived for 0.7 on this corpus, so
    // the two-level walk has headroom to buy the target back with cprobe
    val cfg = Similarity.cprobeForRecall(emb, q, coarse, fine, k = 10,
      nprobe = 16, targetRecall = 0.7)
    assert(cfg.nprobe >= 1 && cfg.nprobe <= coarse.length)
    // the loop may stop short of the target ONLY at the structural
    // ceiling (cprobe = ncoarse ≡ the flat walk at the same nprobe)
    if (cfg.recall < 0.7) assert(cfg.nprobe === coarse.length,
      s"stopped at cprobe=${cfg.nprobe} recall=${cfg.recall} below target without hitting the ceiling")
    // at the ceiling the walk IS the flat tier: recall must equal the
    // flat audit's at the same nprobe
    val flat = Similarity.ivfTopKByExpr(fine, emb, q, k = 10, nprobe = 16)
      .select($"query_id", $"nbr_id")
    val flatRecall = Similarity.bruteForceTopK(emb, q, k = 10)
      .select($"query_id", $"nbr_id")
      .join(flat, Seq("query_id", "nbr_id")).count() / 50.0
    val ceiling = Similarity.cprobeForRecall(emb, q, coarse, fine, k = 10,
      nprobe = 16, targetRecall = 1.0)
    assert(ceiling.nprobe === coarse.length || ceiling.recall === 1.0)
    if (ceiling.nprobe === coarse.length)
      assert(math.abs(ceiling.recall - flatRecall) < 1e-9,
        s"ceiling recall ${ceiling.recall} != flat recall $flatRecall")
  }

  test("quantized index: byte carrier round-trips the int8 values bit-for-bit") {
    val stored = spark.read.parquet(s"$root/qindex")
      .select($"nbr_id", $"cvec".cast("array<double>").as("stored"))
    val expected = emb.select($"vec_id".as("nbr_id"),
      graft.operators.Similarity.quantizeInt8($"embedding").as("expected"))
    // tinyint schema is the footprint claim; equality is the losslessness claim
    assert(spark.read.parquet(s"$root/qindex").schema("cvec").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val mismatches = stored.join(expected, "nbr_id")
      .where(!($"stored" <=> $"expected")).count()
    assert(mismatches === 0L)
  }

  test("quantized serving: exact refine recovers at least the quantized-only recall") {
    // the s62 discipline on the int8 layout: the refine-deep shortlist
    // re-ranked by true cosine must hit the exact top-10 at least as
    // often as serving the quantized scores directly (refine = k keeps
    // the candidate SET equal to the quantized top-10 — re-ranking a
    // set cannot change membership)
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val qidx = spark.read.parquet(s"$root/qindex")
    val q = emb.where($"vec_id" < 5)
    val truth = graft.operators.Similarity.bruteForceTopK(emb, q, k = 10)
      .select($"query_id", $"nbr_id")
    def hits(refine: Int): Long =
      truth.join(graft.operators.Similarity
          .ivfQuantizedRefineTopKOnIndexByExpr(fine, qidx, emb, q, k = 10, refine = refine)
          .select($"query_id", $"nbr_id"),
        Seq("query_id", "nbr_id")).count()
    assert(hits(20) >= hits(10),
      "a 20-deep exact re-rank must not lose to quantized-only top-10")
  }

  test("warm-start trainer: cold IS warm-from-firstN; iters=0 returns the seed") {
    import org.apache.spark.sql.functions.col
    val nlist = 16
    val cold = Similarity.kmeansCentroidsByExpr(emb, nlist = nlist, iters = 2)
    val firstN = emb.orderBy(col("vec_id")).limit(nlist)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val warm = Similarity.kmeansCentroidsByExprWarm(emb, firstN, iters = 2)
    assert(cold.length === warm.length)
    cold.zip(warm).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"cold/warm diverged at centroid $i")
    }
    // the no-op refresh: zero rounds must return the seed values
    val noop = Similarity.kmeansCentroidsByExprWarm(emb, cold, iters = 0)
    cold.zip(noop).foreach { case (a, b) => assert(a.sameElements(b)) }
    // and the returned matrix must not alias the caller's seed array
    val before = cold(0)(0)
    noop(0)(0) += 1.0
    assert(cold(0)(0) === before, "warm trainer must clone its seed")
  }

  test("nprobeForRecall: boundary targets degenerate cleanly") {
    val fine = PipelineQueries.readCentroids(spark, s"$root/centroids")
    val q = emb.where($"vec_id" < 3)
    // a trivially low target is held by the first probe
    val lo = Similarity.nprobeForRecall(emb, q, fine, k = 5, targetRecall = 0.001)
    assert(lo.nprobe === 1)
    // target 1.0 terminates (structurally: probing all lists is exact)
    // and reports recall exactly 1
    val hi = Similarity.nprobeForRecall(emb, q, fine, k = 5, targetRecall = 1.0)
    assert(hi.recall === 1.0)
    assert(hi.nprobe <= fine.length)
  }
}
