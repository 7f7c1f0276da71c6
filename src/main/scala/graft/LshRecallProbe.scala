package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity}

/**
 * SCALING.md probe: the d36 PRODUCTION configuration — partitions ∝ data
 * (`SPARK_GRAFT_PARTITIONS`) × the recall-holding table count
 * L = ⌈8·p(θ)^−(b−4)⌉ at the corpus-sized band width b = lshBitsFor(n) —
 * measured TOGETHER, with recall checked against an exact ground truth
 * at the SAME scale via pair sampling: exact cosine pairs are computed
 * over a deterministic hash-sample S of the corpus (quadratic only in
 * |S|), and each LSH config's recall is measured on the pairs with both
 * endpoints in S. The LSH itself runs over the FULL corpus, so bucket
 * occupancy and collision behavior are the at-scale behavior; the
 * in-sample restriction only subsamples which ground-truth pairs are
 * scored, it does not change their collision odds.
 *
 * Timing note: each config is run ONCE per `runs` with its (small —
 * θ-surviving pairs only) output written to parquet, then recall is
 * computed from the written output — the expensive candidate stage is
 * never re-executed for the recall read.
 *
 * Usage: runMain graft.LshRecallProbe <sfDir> [runs] [configs]
 * `configs` (default "shipped,hold,vtd"): comma-list of which configs
 * to measure — "vtd" is the regime-derived production placement; at
 * sf10 the non-vtd "hold" run costs ~7 minutes on its own, so a
 * re-measure of just the production pair runs "shipped,vtd".
 * Env (as Profile): SPARK_GRAFT_CPUS, SPARK_GRAFT_PARTITIONS,
 *   SPARK_GRAFT_INIT_PARTS. Plus SPARK_GRAFT_BROADCAST_MB (default 128):
 *   the verify joins must BROADCAST the vector side at sf10 — the
 *   recall-holding candidate stream is ~1e9 rows, and shuffling it
 *   through two SortMergeJoins would spill ~50 GB locally; raising the
 *   broadcast threshold for a metadata-sized build side (51 MB of
 *   vectors at sf10) is exactly the knob a cluster deployment sets.
 */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: runMain graft.LshRecallProbe <sfDir> [runs] [shipped,hold,vtd]")
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    require(runs >= 1, s"runs must be >= 1 (got $runs) — a zero-run " +
      "invocation would score stale parquet from a prior run as this " +
      "config's recall")
    val wanted = (if (args.length > 2) args(2) else "shipped,hold,vtd")
      .split(",").map(_.trim).toSet
    // fail loudly on a typo (e.g. the printed label 'recall_hold'
    // instead of the token 'hold') — silently measuring FEWER configs
    // than asked is the partial-measurement failure mode the runs>=1
    // guard exists for
    require(wanted.nonEmpty && wanted.subsetOf(Set("shipped", "hold", "vtd")),
      s"unknown config token(s) ${(wanted -- Set("shipped", "hold", "vtd")).mkString(", ")} — " +
        "valid: shipped, hold, vtd")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val initParts = sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", parts)
    val bcastMb = sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "128").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${bcastMb * 1024L * 1024L}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val theta = 0.5
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    // the production configuration is now a first-class derivation —
    // the probe measures exactly what recallHeldNearDupPairs would run
    // (r10 hand-computed L = ⌈8·p^−(b−4)⌉ from SCALING.md instead)
    val cfg = Similarity.recallHeldConfig(emb, theta, corpusSize = Some(n))
    val b = cfg.bits
    val lHold = cfg.tables
    val p = Similarity.collisionProb(theta)
    println(f"[lshprobe] n=$n b=$b p=$p%.4f L_hold=$lHold (tablesForRecall 0.85) " +
      f"vtd_regime=${cfg.verifyThenDistinct} parts=$parts initParts=$initParts bcastMb=$bcastMb")

    // deterministic ground-truth sample: ~6000 vectors, exact pairs
    val rate = math.min(1.0, 6000.0 / n)
    val sample = Sampling.hashSample(emb, concat(lit("vec:"), col("vec_id")), rate)
      .localCheckpoint(true)
    val sn = sample.count()
    val t0 = System.nanoTime()
    val exact = Similarity.nearDupPairs(sample, theta)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[lshprobe] sample=$sn exact_pairs=${exact.size} exact_time=${(System.nanoTime() - t0) / 1e9}%.1f s" + " [" + HostLoad.line + "]")
    val sids = sample.select(col("vec_id")).as[Long].collect().toSet
    val sidsB = spark.sparkContext.broadcast(sids)

    def measure(label: String, tables: Int, verifyThenDistinct: Boolean = false): Unit = {
      // keyed by sf so a leftover directory from a DIFFERENT scale's
      // invocation can never be scored as this one's recall; deleted
      // up front so a run that dies mid-write fails the read loudly
      // instead of silently scoring the prior invocation's output
      val out = s"/tmp/lshprobe_${new java.io.File(sfDir).getName}_$label"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      (1 to runs).foreach { i =>
        val t = System.nanoTime()
        Similarity.bandedNearDupPairs(emb, theta, tables = tables, bitsPerTable = b,
            verifyThenDistinct = verifyThenDistinct)
          .write.mode("overwrite").parquet(out)
        val sec = (System.nanoTime() - t) / 1e9
        SessionHygiene.sweep(spark)
        println(f"[lshprobe] $label (L=$tables, b=$b) run$i: $sec%.1f s" + " [" + HostLoad.line + "]")
      }
      val found = spark.read.parquet(out)
        .filter(r => sidsB.value.contains(r.getLong(0)) && sidsB.value.contains(r.getLong(1)))
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = (found intersect exact).size
      val total = spark.read.parquet(out).count()
      println(f"[lshprobe] $label recall=${if (exact.isEmpty) -1.0 else hit.toDouble / exact.size}%.3f " +
        f"($hit/${exact.size} in-sample) total_pairs=$total")
    }

    if (wanted("shipped"))
      measure("shipped", 8)      // the declared d36 sizing (L fixed, b corpus-sized)
    if (wanted("hold"))
      measure("recall_hold", lHold) // the production recall-holding product
    // the broadcast-regime variant: dedupe AFTER the map-side verify,
    // so the full candidate stream never shuffles (SCALING.md r10)
    if (wanted("vtd"))
      measure("recall_hold_vtd", lHold, verifyThenDistinct = true)
    spark.stop()
  }
}
