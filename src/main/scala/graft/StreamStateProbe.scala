package graft

import org.apache.spark.sql.SparkSession

import graft.queries.StreamingQueries

/**
 * SCALING.md probe: streaming state-store metrics OBSERVED from
 * `StreamingQueryProgress.stateOperators` (numRowsTotal, numRowsUpdated,
 * memoryUsedBytes) beside steady wall-clock, for the four state-shape
 * representatives — s40 (domain-bounded window state), s48 (GroupState
 * record/user), s68 (tws ValueState/user), s70 (tws ValueState +
 * timer/user) — so the "state = bytes/key" claims are measurements,
 * not wall-clock inference. Also runs the s70 topology at BOTH timer
 * write disciplines in the same JVM (the r11 fix's A/B): identical
 * output is spec-pinned; this measures the commit-volume difference.
 *
 * Usage: runMain graft.StreamStateProbe <sfDir> [runs] [s70ab|s70sparse]
 * `s70ab` runs ONLY the two s70 timer disciplines, INTERLEAVED
 * (disc, naive, disc, naive, …) so neither variant systematically
 * pays the colder cache/compaction state — the same-session pairing
 * discipline SCALING.md requires; read the per-variant MIN.
 * `s70sparse` runs the same interleaved A/B on the TEN-BATCH
 * late-arrival hash-split source (the r11 verdict's missing
 * workload): most deliveries after batch 1 are below-watermark, so
 * the disciplined kernel's skip path ("no admissible change → zero
 * writes for that key") is exercised — read the per-batch
 * numRowsUpdated columns, which the time-ordered replay cannot
 * separate (there every delivery moves every session).
 * Env (as Profile): SPARK_GRAFT_CPUS, SPARK_GRAFT_PARTITIONS,
 *   SPARK_GRAFT_STATE_PROVIDER (s48/s40 honor the session default;
 *   s68/s70 force RocksDB as the operator requires).
 */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.StreamStateProbe <sfDir> [runs] [s70ab]")
    val sfDir = args(0)
    val extra = args.drop(1)
    // both trailing args are optional and order-free: '<sfDir> s70ab'
    // must not trip over a missing runs count — and anything beyond
    // ONE runs value fails loudly rather than being silently dropped
    val abOnly = extra.contains("s70ab")
    val sparseAb = extra.contains("s70sparse")
    require(!(abOnly && sparseAb),
      "s70ab and s70sparse are exclusive modes — run the probe twice")
    val rest = extra.filterNot(a => a == "s70ab" || a == "s70sparse")
    require(rest.size <= 1,
      s"too many arguments (${rest.mkString(", ")}) — expected at most one [runs]")
    val runs = rest.headOption.map { a =>
      require(a.nonEmpty && a.length <= 9 && a.forall(_.isDigit),
        s"runs must be a positive integer, got '$a'")
      a.toInt
    }.getOrElse(2)
    require(runs >= 1, s"runs must be >= 1, got $runs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (sys.env.get("SPARK_GRAFT_STATE_PROVIDER").map(_.toLowerCase) match {
      case Some("rocksdb") => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case Some("heap") | Some("default") | None => builder
      case Some(other) => sys.error(s"unknown SPARK_GRAFT_STATE_PROVIDER '$other'")
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cases: Seq[(String, String, () => Unit)] = Seq(
      ("s40_hourly", "s40_sink",
        () => SparkEntry.queries("s40_stream_hourly")(spark, sfDir).collect()),
      ("s48_groupstate_sessions", "s48_sink",
        () => SparkEntry.queries("s48_stream_sessionize")(spark, sfDir).collect()),
      ("s68_tws_transitions", "s68_sink",
        () => SparkEntry.queries("s68_stream_transitions")(spark, sfDir).collect()),
      ("s70_tws_timer_sessions", "s70_sink",
        () => StreamingQueries.sessionTimersQuery(spark, sfDir, naiveTimers = false).collect()),
      ("s70_NAIVE_timers", "s70_naive_sink",
        () => StreamingQueries.sessionTimersQuery(spark, sfDir, naiveTimers = true).collect()))

    if (abOnly || sparseAb) {
      // interleaved A/B: per-iteration (disc, naive) pairs share host
      // conditions; report each variant's min. `s70sparse` runs the
      // ten-batch late-arrival source and additionally reports the
      // per-batch numRowsUpdated trail — the skip-path observable.
      val tag = if (sparseAb) "s70sparse" else "s70"
      val times = scala.collection.mutable.Map(
        "disc" -> List.empty[Double], "naive" -> List.empty[Double])
      val updated = scala.collection.mutable.Map.empty[String, Seq[Long]]
      val storeOps = scala.collection.mutable.Map.empty[String, Map[String, Long]]
      (1 to runs).foreach { i =>
        Seq("disc" -> false, "naive" -> true).foreach { case (label, naive) =>
          val t = System.nanoTime()
          StreamingQueries.sessionTimersQuery(spark, sfDir,
            naiveTimers = naive, sparse = sparseAb).collect()
          val sec = (System.nanoTime() - t) / 1e9
          val sink = StreamingQueries.sessionTimersSink(naive, sparseAb)
          updated(label) = StreamingQueries.capturedStateMetrics(sink).map(_._3)
          // store-LEVEL op counters (rocksdbPutCount/GetCount/…) see the
          // timer-key traffic numRowsUpdated can't — summed over batches
          storeOps(label) = StreamingQueries.capturedCustomMetrics(sink)
            .flatMap(_.toSeq).groupBy(_._1)
            .map { case (k, vs) => k -> vs.map(_._2).sum }
            // counters ONLY (rocksdb*Count, num*) — the latency gauges
            // (rocksdb*Latency) are nanosecond values a sum would pass
            // off as an op count
            .filter { case (k, _) => k.endsWith("Count") || k.startsWith("num") }
          SessionHygiene.sweep(spark)
          times(label) = times(label) :+ sec
          println(f"[stateprobe] ${tag}_$label round$i: $sec%.1f s" + " [" + HostLoad.line + "]")
        }
      }
      Seq("disc", "naive").foreach { l =>
        println(f"[stateprobe] ${tag}_$l min=${times(l).min}%.1f s all=${times(l).map(t => f"$t%.1f").mkString(",")}")
        // both trails are overwritten per iteration, so both report the
        // LAST run — label them identically (r12 advice: the timing
        // line is the min across runs, the trails are last-run; mixing
        // provenance unlabeled misreads as same-run figures). The
        // batch structure is deterministic across runs (same source,
        // same triggers), so last-run trails are representative; only
        // the wall-clock needs the min discipline.
        val u = updated.getOrElse(l, Nil)
        println(s"[stateprobe] ${tag}_$l numRowsUpdated/batch(last run)=${u.mkString(",")} sum=${u.sum}")
        val so = storeOps.getOrElse(l, Map.empty)
        println(s"[stateprobe] ${tag}_$l storeOps(last run, sum over batches): " +
          so.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      spark.stop()
      return
    }

    cases.foreach { case (label, sink, body) =>
      // same measurement discipline as the A/B path (and SCALING.md):
      // the steady figure is the MIN across runs, not the last run
      var best = Double.MaxValue
      (1 to runs).foreach { i =>
        val t = System.nanoTime()
        body()
        val sec = (System.nanoTime() - t) / 1e9
        best = math.min(best, sec)
        SessionHygiene.sweep(spark)
        println(f"[stateprobe] $label run$i: $sec%.1f s" + " [" + HostLoad.line + "]")
      }
      val mets = StreamingQueries.capturedStateMetrics(sink)
      val totalUpdated = mets.map(_._3).sum
      mets.lastOption match {
        case Some((op, rows, _, mem)) =>
          println(f"[stateprobe] $label steady(min)=$best%.1f s op=$op " +
            f"numRowsTotal=$rows memoryUsedBytes=$mem " +
            f"numRowsUpdated(sum over ${mets.size} batches)=$totalUpdated")
        case None =>
          println(f"[stateprobe] $label steady(min)=$best%.1f s (no state metrics captured)")
      }
    }
    spark.stop()
  }
}
