package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.ClusterHash
import graft.functions.ClusterHashFunctions.cluster_node

class SlotPartitioningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val customer = spark.read.parquet(s"${SparkTestSession.sf0001}/customer.parquet")
    .select(concat(lit("user:"), $"c_custkey").as("key"), $"c_custkey")

  test("repartitionByNode co-locates each node in exactly one partition") {
    val parted = SlotPartitioning.repartitionByNode(customer, $"key")
    assert(parted.rdd.getNumPartitions == 6)
    // hash partitioning guarantee: all rows of a node share one partition
    // (two nodes may share a partition — hash collision — but never split)
    val split = parted.select($"key", cluster_node($"key").as("node"))
      .withColumn("pid", spark_partition_id())
      .groupBy("node").agg(countDistinct($"pid").as("n"))
      .where($"n" > 1).count()
    assert(split == 0)
  }

  test("colocated join plans no exchange above the pre-partitioned children") {
    val orders = spark.read.parquet(s"${SparkTestSession.sf0001}/orders.parquet")
      .select(concat(lit("user:"), $"o_custkey").as("key"), $"o_orderkey")
    val (l, r) = SlotPartitioning.colocatedJoin(customer, $"key", orders, $"key", 8)
    val joined = l.join(r, "key")
    val plan = joined.queryExecution.executedPlan.toString
    // exactly the two repartition exchanges, none introduced by the join
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges (one per side), plan:\n$plan")
    assert(joined.count() > 0)
  }

  test("shard-aligned write produces one directory per node with pruning") {
    val dir = java.nio.file.Files.createTempDirectory("shard_aligned").toString
    SlotPartitioning.writeShardAligned(customer, $"key", dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == (1 to 6).map(n => s"node=$n"))
    // partition pruning: reading one shard scans only its directory
    val one = spark.read.parquet(dir).where($"node" === 3)
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(node"), scanned)
    // round-trip correctness vs the core
    val bad = one.select($"key").collect()
      .count(r => ClusterHash.getNode(r.getString(0)) != 3)
    assert(bad == 0)
  }

  test("nodeBalance shares sum to 1") {
    val shares = SlotPartitioning.nodeBalance(customer, $"key")
      .select($"share").collect().map(_.getDouble(0))
    assert(shares.length == 6)
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }
}
