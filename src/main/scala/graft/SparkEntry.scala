package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query (sf0.001): the reference's headline use case
   * (README.md:109-120) — synthesize keys for every customer, compute
   * slot and node, and report the per-node key distribution with skew
   * stats. One scan, one partial-agg exchange on a 6-value key.
   */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(concat(lit("user:"), $"c_custkey").as("key"))
      .select($"key", cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("keys"), countDistinct($"slot").as("distinct_slots"))
      .orderBy("node")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ AnalyticsQueries.queries ++ AnalyticsQueries.queries2 ++ AnalyticsQueries.queries3 ++ PipelineQueries.queries ++ ExtrasQueries.queries ++ RelationalQueries.queries ++ StreamingQueries.queries ++ SqlSurfaceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ AnalyticsQueries.oracles ++ AnalyticsQueries.oracles2 ++ AnalyticsQueries.oracles3 ++ PipelineQueries.oracles ++ ExtrasQueries.oracles ++ RelationalQueries.oracles ++ StreamingQueries.oracles ++ SqlSurfaceQueries.oracles
}
