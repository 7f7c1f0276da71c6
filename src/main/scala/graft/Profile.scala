package graft

import org.apache.spark.sql.SparkSession

/**
 * Developer profiling harness: time named queries (3 runs each) and
 * optionally dump the formatted plan. NO warm-up is performed — run 1
 * includes codegen compilation and cold JIT (the costs Bench's warm-up
 * phase removes); read run 2-3 for steady-state numbers.
 *
 * Usage: runMain graft.Profile <sfDir> <query>[,<query>...] [--explain] [--runs N]
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val runs = args.indexOf("--runs") match {
      case -1 => 3
      case i  => args(i + 1).toInt
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
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
