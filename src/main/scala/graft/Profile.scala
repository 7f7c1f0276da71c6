package graft

import org.apache.spark.sql.SparkSession

/**
 * Developer profiling harness: time named queries (3 runs each) and
 * optionally dump the formatted plan. NO warm-up is performed — run 1
 * includes codegen compilation and cold JIT (the costs Bench's warm-up
 * phase removes); read run 2-3 for steady-state numbers.
 *
 * Usage: runMain graft.Profile <sfDir> <query>[,<query>...] [--explain] [--runs N]
 *
 * Env: SPARK_GRAFT_CPUS (local[N], default 32);
 * SPARK_GRAFT_PARTITIONS (spark.sql.shuffle.partitions, default = CPUS —
 * override to measure partition-count effects at a fixed core count,
 * e.g. the SCALING.md sf10 partition-scaled runs);
 * SPARK_GRAFT_BROADCAST_MB (optional — raises
 * autoBroadcastJoinThreshold so the regime-derived d73/d74 placements
 * select the broadcast-verify form at sf10, as a cluster would).
 */
object Profile {
  private val Usage =
    "usage: runMain graft.Profile <sfDir> <query>[,<query>...] [--explain] [--runs N]"
  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println(Usage); sys.exit(2) }
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val runs = args.indexOf("--runs") match {
      case -1 => 3
      case i  =>
        if (i + 1 >= args.length) { System.err.println(s"--runs needs a number\n$Usage"); sys.exit(2); 0 }
        else args(i + 1).toIntOption.filter(_ >= 1).getOrElse {
          System.err.println(s"--runs needs a positive number, got '${args(i + 1)}'\n$Usage"); sys.exit(2); 0
        }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    // AQE's coalesce path plans shuffles WIDE and merges small
    // partitions back at runtime, so a high initial width costs small
    // queries nothing while keeping big shuffles parallel — the
    // "partitions ∝ data" knob the SCALING.md sf10 measurements turn
    val initParts = sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", parts)
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    // SPARK_GRAFT_BROADCAST_MB raises autoBroadcastJoinThreshold (as
    // LshRecallProbe): the regime-derived placements (d73/d74) read
    // the session threshold, so measuring the broadcast-verify regime
    // at sf10 needs the executor-memory-backed value a real cluster
    // would configure, not local-mode's conservative 10 MB default
    val builder = sys.env.get("SPARK_GRAFT_BROADCAST_MB")
      .map(mb => builder0.config("spark.sql.autoBroadcastJoinThreshold",
        s"${mb.toInt * 1024L * 1024L}"))
      .getOrElse(builder0)
    // SPARK_GRAFT_STATE_PROVIDER=rocksdb switches the session-default
    // state store (the heap-vs-RocksDB knob for streaming queries that
    // do not force a provider themselves, e.g. s48's GroupState kernel
    // — the SCALING.md sf10 state-growth comparison)
    val builder2 = sys.env.get("SPARK_GRAFT_STATE_PROVIDER").map(_.toLowerCase) match {
      case Some("rocksdb") => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case Some("heap") | Some("default") | None => builder
      // fail LOUDLY: a typo silently measuring the heap store as
      // "RocksDB" would poison a SCALING.md comparison
      case Some(other) => sys.error(
        s"SPARK_GRAFT_STATE_PROVIDER='$other' not recognized (rocksdb|heap|default)")
    }
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" — arbitrary session confs for
    // config A/Bs (r17: the AQE partition-coalescing experiments) so a
    // one-off measurement never needs a code edit. Malformed pairs fail
    // loudly for the same reason as the state-provider knob.
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").filter(_.nonEmpty).foldLeft(builder2) { (b, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty => b.config(k.trim, v.trim)
          case _ => sys.error(s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not k=v")
        }
      })
      .getOrElse(builder2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        SessionHygiene.sweep(spark)
        println(f"[profile] $n run$i: $sec%.3f s")
      }
    }
    spark.stop()
  }
}
