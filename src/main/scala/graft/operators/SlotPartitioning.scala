package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}

/**
 * The Spark-native payoff of the cluster-hash functions (SURVEY.md §7
 * phase 4): not just *computing* slot/node, but using them as physical
 * layout. Because `ClusterSlot`/`ClusterNode` are deterministic Catalyst
 * expressions, they are legal partitioning expressions — `repartition(n,
 * cluster_node(key))` gives real shard-aligned layout, and two tables
 * repartitioned the same way co-locate: Catalyst sees matching
 * HashPartitioning on both sides and plans the join with NO extra
 * exchange (verified by SlotPartitioningSpec on the physical plan).
 *
 * At 100 TB this is the difference between reshuffling every join and
 * shuffling once at ingest: write the table bucketed by slot/node, then
 * all slot-keyed joins/aggs are exchange-free.
 */
object SlotPartitioning {

  /** Repartition so each shard's rows land in a single Spark partition
    * (hash partitioning: a node never splits; writeShardAligned gives the
    * strict one-directory-per-node layout). */
  def repartitionByNode(df: DataFrame, key: Column, nodes: Int = 6): DataFrame =
    df.repartition(nodes, cluster_node(key))

  /** Repartition by hash slot across `numPartitions`. */
  def repartitionBySlot(df: DataFrame, key: Column, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, cluster_slot(key))

  /**
   * Shard-aligned parquet layout: one directory per node id
   * (`node=k/...`), so a per-shard reader prunes to its own files
   * (partition pruning on the node column).
   */
  def writeShardAligned(df: DataFrame, key: Column, path: String, nodes: Int = 6): Unit =
    df.withColumn("node", cluster_node(key))
      .repartition(nodes, col("node"))
      .write.partitionBy("node").mode("overwrite").parquet(path)

  /**
   * Persistent slot-bucketed layout: write `df` as a catalog table
   * bucketed (and sorted) by its materialized `cluster_slot(key)` column.
   * This is the "shuffle once at ingest" half of the 100 TB story: every
   * later join/agg whose keys include `slot` reads the bucketed scan's
   * HashPartitioning straight off disk and plans ZERO exchange (see
   * p11_bucketed_coloc + its plan check). External table (explicit path
   * under the session warehouse dir) so overwrite re-runs cleanly.
   */
  def writeSlotBucketed(df: DataFrame, key: Column, table: String,
                        buckets: Int = 16): Unit = {
    // external table with an explicit location derived from the session
    // warehouse (NOT cwd-relative) so overwrite re-runs cleanly and the
    // data lands where the session says tables live
    val warehouse = df.sparkSession.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/")
    df.withColumn("slot", cluster_slot(key))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$warehouse/graft_bucketed/$table")
      .bucketBy(buckets, "slot").sortBy("slot")
      .saveAsTable(table)
  }

  /**
   * Co-located join: both sides pre-partitioned on the same slot
   * expression over their join key. The join itself then reuses the
   * children's partitioning (one exchange per side, zero for the join).
   */
  def colocatedJoin(left: DataFrame, leftKey: Column,
                    right: DataFrame, rightKey: Column,
                    numPartitions: Int = 32): (DataFrame, DataFrame) =
    (repartitionBySlot(left, leftKey, numPartitions),
      repartitionBySlot(right, rightKey, numPartitions))

  /**
   * Salted join for skewed keys: the big (skewed) side gets a
   * deterministic salt derived from a unique column, the small side is
   * replicated `salts` times, and the join runs on (key, salt) — so a
   * hot key's rows spread over `salts` reducers instead of one. Result
   * is row-identical to the plain join (verified by spec + oracle); only
   * the physical distribution changes. At 100 TB this is the manual
   * fallback when AQE's skew-join splitting isn't available (e.g.,
   * non-shuffle-join strategies or pre-AQE clusters).
   */
  def saltedJoin(bigSkewed: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, salts: Int = 8): DataFrame = {
    val salted = bigSkewed.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Per-node balance/skew report: key count, distinct slots, share of
   * total — the reference's headline analysis (README.md:109-120) plus
   * skew metrics, as one partial-agg pass.
   */
  def nodeBalance(df: DataFrame, key: Column): DataFrame = {
    val perNode = df.select(cluster_slot(key).as("slot"), cluster_node(key).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("keys"), countDistinct(col("slot")).as("distinct_slots"))
    // total via broadcast cross join of a 1-row aggregate — an
    // unpartitioned window here would funnel the frame through a single
    // WindowExec partition (and warn on every run)
    val total = perNode.agg(sum("keys").as("__total"))
    perNode.crossJoin(broadcast(total))
      .withColumn("share", col("keys").cast("double") / col("__total"))
      .drop("__total")
  }
}
