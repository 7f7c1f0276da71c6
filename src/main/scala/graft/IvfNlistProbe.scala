package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * SCALING.md probe: what the `ivfListsFor` cap (maxBits=5 → 32 lists)
 * costs as the corpus outgrows it. Occupancy at the cap grows linearly
 * with n, so the probed candidate fraction is pinned at nprobe/32 of
 * the corpus no matter how large the corpus gets — this probe measures
 * the trade the cap is making: k-means training cost (∝ n·nlist·dim
 * per iteration) against serving cost (candidate volume ∝ nprobe/nlist)
 * across nlist values at and past the cap, so the "raise maxBits with
 * the corpus" decision is a measured knob, not a guess.
 *
 * In-memory path (ivfAssigned + the shared candidate stage) — no index
 * persist, so nlist sweeps don't touch the digest-chained exports the
 * declared queries serve from.
 *
 * Usage: runMain graft.IvfNlistProbe <sfDir> [nlistCsv] [runs]
 *   defaults: nlists 16,32,64,128 — 16 is the shipped raw-index value,
 *   32 the ivfListsFor cap, 64/128 the past-cap candidates; runs 2
 *   (read the min — the first serve pays codegen).
 * Env (as Profile): SPARK_GRAFT_CPUS, SPARK_GRAFT_PARTITIONS.
 */
object IvfNlistProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.IvfNlistProbe <sfDir> [nlistCsv] [runs]")
    val sfDir = args(0)
    val nlists = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16, 32, 64, 128))
    // nprobe=4 below: an nlist under that makes the probed fraction
    // (and the printed "theoretical 4/nl") meaningless — reject loudly
    require(nlists.forall(_ >= 4), s"nlists must be >= nprobe=4: $nlists")
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    require(runs >= 1, s"runs must be >= 1, got $runs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // cache the corpus once so every nlist pays the same (warm) scan —
    // the sweep compares assignment/serve arithmetic, not disk
    emb.persist(); val n = emb.count()
    val queries = emb.where(col("vec_id") < 5)
    // COUNT the query set rather than assuming vec_ids start at 0 —
    // the fraction below divides by it, and a silent shortfall would
    // put a wrong number into SCALING.md
    val nq = queries.count()
    require(nq > 0, s"no query vectors with vec_id < 5 in $sfDir")
    println(s"[nlistprobe] corpus n=$n queries=$nq nprobe=4")

    nlists.foreach { nl =>
      val t0 = System.nanoTime()
      val cents = Similarity.kmeansCentroids(emb, nlist = nl, iters = 2)
      val trainSec = (System.nanoTime() - t0) / 1e9
      // the assigned corpus is the BUILD product (what the persisted
      // index stores) — pay it once per nlist, outside the serve
      // timing, exactly as the s60 read path does
      val t1 = System.nanoTime()
      val assigned = Similarity.ivfAssigned(cents, emb)
      assigned.persist(); assigned.count()
      val buildSec = (System.nanoTime() - t1) / 1e9
      var serveMin = Double.MaxValue
      var cands = -1L
      (1 to runs).foreach { _ =>
        val t2 = System.nanoTime()
        // the shared batch/streaming candidate stage, counted — the
        // serving work that scales with occupancy = n·nprobe/nlist
        cands = Similarity.ivfCandidates(assigned, cents, queries, nprobe = 4).count()
        serveMin = math.min(serveMin, (System.nanoTime() - t2) / 1e9)
      }
      assigned.unpersist()
      val frac = cands.toDouble / (nq.toDouble * n)
      println(f"[nlistprobe] nlist=$nl%4d train=$trainSec%.1f s build=$buildSec%.1f s " +
        f"serve(min)=$serveMin%.1f s candidates=$cands%d " +
        f"fraction=$frac%.4f (theoretical ${4.0 / nl}%.4f)" + " [" + HostLoad.line + "]")
    }
    spark.stop()
  }
}
