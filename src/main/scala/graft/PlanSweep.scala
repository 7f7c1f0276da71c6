package graft

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/**
 * r16 optimization-round sweep: plan every declared query and emit one
 * line of physical-plan statistics per query — exchange count, join
 * strategies, scan count, presence of CartesianProduct /
 * BroadcastNestedLoopJoin, and WholeStageCodegen span count — so the
 * whole 242-query surface can be red-flag audited in one pass instead
 * of only the PLANS.md headline set. Planning only (no execution),
 * though query CONSTRUCTION may run ensure-exports/streams exactly as
 * Verify does.
 *
 * Usage: runMain graft.PlanSweep <sfDir> <outFile> [skipStreaming]
 */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "/tmp/plan_sweep.txt"
    val skipStreaming = args.length > 2 && args(2) == "skipStreaming"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streamingNames = graft.queries.StreamingQueries.queries.keySet
    val sb = new StringBuilder
    sb.append("# name exchanges smj bhj shj bnlj cartesian scans wsc notes\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!(skipStreaming && streamingNames.contains(name))) {
        try {
          val df = fn(spark, sfDir)
          // executedPlan, NOT sparkPlan (r17, ADVICE.md): sparkPlan
          // predates prepareForExecution, so EnsureRequirements-inserted
          // Exchange nodes are absent and WholeStageCodegen doesn't
          // exist yet — the audit would systematically undercount
          // exchanges and always report wsc=0. The executedPlan's tree
          // string includes AdaptiveSparkPlanExec's inner (initial)
          // plan, so counting needle lines sees the full prepared tree
          // without reaching into private[sql] accessors.
          val planStr = df.queryExecution.executedPlan.toString
          def cnt(needle: String): Int =
            planStr.linesIterator.count(_.contains(needle))
          // codegen spans print as "*(n) Operator" — count DISTINCT ids
          val wsc = "\\*\\((\\d+)\\)".r
            .findAllMatchIn(planStr).map(_.group(1)).toSet.size
          sb.append(s"$name ${cnt("Exchange")} ${cnt("SortMergeJoin")} " +
            s"${cnt("BroadcastHashJoin")} ${cnt("ShuffledHashJoin")} " +
            s"${cnt("BroadcastNestedLoopJoin")} ${cnt("CartesianProduct")} " +
            s"${cnt("Scan")} $wsc\n")
        } catch { case NonFatal(e) =>
          sb.append(s"$name ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}\n")
        }
        SessionHygiene.sweep(spark)
      }
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[plan-sweep] wrote $outFile")
    spark.stop()
  }
}
