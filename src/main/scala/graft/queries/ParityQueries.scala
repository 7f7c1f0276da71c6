package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}
import graft.oracle.DuckSql
import graft.sources.Tables

/**
 * The reference's own capability surface, end-to-end (SURVEY.md §2.1-2.2):
 * cluster_slot/cluster_node over literals, synthesized keys, hash-tag
 * co-location, node distributions, hot-spot analysis, ILIKE, concat,
 * generate_series. Every query here has a full DuckDB oracle — including
 * the cluster functions, whose oracles recompute CRC16 in SQL (DuckSql).
 *
 * Scale notes: all cluster-hash queries are narrow transforms (scan →
 * project) plus at most one exchange for a groupBy on a 16k/6-value key —
 * the aggregation is partial (map-side combine) so the shuffle carries at
 * most `slots × partitions` rows regardless of input size.
 */
object ParityQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)
  private def sq(x: String): String = "'" + x.replace("'", "''") + "'"

  /** ASCII subset of FIXTURES.md §1 golden keys (oracle uses `ord`). */
  val goldenKeys: Seq[String] = Seq("user:1000", "product:5432",
    "{user:1000}:profile", "{user:1000}:sessions", "{user:profile}:1000",
    "foo", "bar", "hello", "", "{}", "{}x", "a{b}c", "{{inner}}", "key{",
    "key}", "{user1000}.following", "{user1000}.followers", "user:1",
    "user:2", "user:999")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2: scalar fn over literals/values; exercises every hash-tag edge case
    "p01_slot_literals" -> ((s, _) => {
      import s.implicits._
      goldenKeys.toDF("key")
        .select($"key", cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
        .orderBy("key")
    }),
    // README.md:74-85: slot/node of keys synthesized from a table column
    "p02_customer_slots" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select(concat(lit("user:"), $"c_custkey").as("key"))
        .select($"key", cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
        .orderBy("key")
    }),
    // README.md:94-102: hash-tag co-location — slot of "{cust:N}:order:M"
    // equals slot of the bare tag "cust:N"
    "p03_hashtag_coloc" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          concat(lit("{cust:"), $"o_custkey", lit("}:order:"), $"o_orderkey").as("key"),
          concat(lit("cust:"), $"o_custkey").as("tagkey"))
        .select($"o_orderkey",
          cluster_slot($"key").as("slot_key"),
          cluster_slot($"tagkey").as("slot_tag"))
        .withColumn("coloc", $"slot_key" === $"slot_tag")
        .orderBy("o_orderkey")
    }),
    // README.md:109-120: generate_series → key synthesis → node distribution
    "p04_node_distribution" -> ((s, _) => {
      import s.implicits._
      s.range(1, 1001)
        .select(concat(lit("user:"), $"id").as("key"))
        .select(cluster_node($"key").as("node"))
        .groupBy("node").agg(count(lit(1)).as("cnt"))
        .orderBy("node")
    }),
    // README.md:15 use case: hot-spot detection — a segment-tag key scheme
    // funnels 1500 customers into exactly 5 slots
    "p05_hotspot_segments" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select(concat(lit("{"), $"c_mktsegment", lit("}:"), $"c_custkey").as("key"))
        .select(cluster_slot($"key").as("slot"))
        .groupBy("slot").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"slot")
    }),
    // Our 2-arg generalization (SURVEY.md §2.1 README/impl mismatch note)
    "p06_nodes_n12" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select(concat(lit("user:"), $"c_custkey").as("key"))
        .select(cluster_node($"key", lit(12)).as("node12"))
        .groupBy("node12").agg(count(lit(1)).as("cnt"))
        .orderBy("node12")
    }),
    // §2.2 ILIKE (test/sql/quack.test:21 pattern), case-insensitive match
    "p07_ilike" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_name".ilike("%RED%"))
        .select($"p_partkey", $"p_name")
        .orderBy("p_partkey")
    }),
    // Raw hashing throughput: slot+node for every lineitem composite key
    // (600k keys at sf0.1) in one codegen'd scan pass — the reference's
    // core workload at bulk scale. Full oracle since round 3: the
    // unrolled vectorized CRC fold (DuckSql.withSlotNode) runs 60k keys
    // in ~0.1 s where the old list_reduce lambda took ~15 s.
    "p12_slot_throughput" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(concat(lit("order:"), $"l_orderkey", lit(":"), $"l_linenumber").as("key"))
        .select(cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("keys"), countDistinct($"slot").as("slots"))
        .orderBy("node")
    }),
    // Resharding plan: the migration matrix a 6→12 node scale-out needs —
    // how many keys each old node sends to each new node (keys where
    // node6 ≠ node12 must move; slot assignment itself never changes, the
    // cluster-hash invariant that makes resharding slot-granular). One
    // scan, both node mappings computed in the same codegen stage, one
    // map-combined agg on a ≤72-cell key space.
    "p16_reshard_matrix" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(concat(lit("order:"), $"o_orderkey").as("key"))
        .select(cluster_node($"key").as("node6"),
          cluster_node($"key", lit(12)).as("node12"))
        .groupBy("node6", "node12")
        .agg(count(lit(1)).as("keys"))
        .orderBy("node6", "node12")
    }),
    // E2 lifecycle path (SURVEY.md §3): SQL text → parse → resolve against
    // the registered functions → same plans as the DataFrame path
    "p09_sql_path" -> ((s, dir) => {
      graft.functions.ClusterHashFunctions.register(s)
      Tables.registerAll(s, dir)
      s.sql("""SELECT cluster_node('user:' || c_custkey) AS node,
              |       count(*) AS cnt,
              |       count(DISTINCT cluster_slot('user:' || c_custkey)) AS slots
              |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
    }),
  )

  val oracles: Map[String, String] = Map(
    "p12_slot_throughput" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT 'order:' || l_orderkey || ':' || l_linenumber AS key FROM lineitem",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(*) AS keys, count(DISTINCT slot) AS slots
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
    "p01_slot_literals" ->
      (DuckSql.withSlotNode(
        s"SELECT unnest([${goldenKeys.map(sq).mkString(",")}]) AS key",
        Seq("key"), Some("slot"), Some("node")) + " ORDER BY key"),
    "p02_customer_slots" ->
      (DuckSql.withSlotNode(
        "SELECT 'user:' || c_custkey AS key FROM customer",
        Seq("key"), Some("slot"), Some("node")) + " ORDER BY key"),
    // the oracle derives both columns from the bare tag — equality with the
    // Spark side proves our brace extraction on the full key
    "p03_hashtag_coloc" ->
      (DuckSql.withSlotNode(
        "SELECT o_orderkey, 'cust:' || o_custkey AS key FROM orders",
        Seq("o_orderkey"), Some("slot_key"), None) match {
        case sql => s"""SELECT o_orderkey, slot_key, slot_key AS slot_tag,
                       | slot_key = slot_key AS coloc FROM ($sql) ORDER BY o_orderkey""".stripMargin
      }),
    "p04_node_distribution" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT 'user:' || i AS key FROM range(1,1001) t(i)",
        Seq(), None, Some("node"))
      s"SELECT node, count(*) AS cnt FROM ($inner) GROUP BY node ORDER BY node"
    },
    "p05_hotspot_segments" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT '{' || c_mktsegment || '}:' || c_custkey AS key FROM customer",
        Seq(), Some("slot"), None)
      s"SELECT slot, count(*) AS cnt FROM ($inner) GROUP BY slot ORDER BY cnt DESC, slot"
    },
    "p06_nodes_n12" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT 'user:' || c_custkey AS key FROM customer",
        Seq(), None, None, Some(("node12", 12)))
      s"SELECT node12, count(*) AS cnt FROM ($inner) GROUP BY node12 ORDER BY node12"
    },
    "p16_reshard_matrix" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT 'order:' || o_orderkey AS key FROM orders",
        Seq(), None, Some("node6"), Some(("node12", 12)))
      s"""SELECT node6, node12, count(*) AS keys FROM ($inner)
         |GROUP BY node6, node12 ORDER BY node6, node12""".stripMargin
    },
    "p07_ilike" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name ILIKE '%RED%' ORDER BY p_partkey",
    "p09_sql_path" -> {
      val inner = DuckSql.withSlotNode(
        "SELECT 'user:' || c_custkey AS key FROM customer",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(*) AS cnt, count(DISTINCT slot) AS slots
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
  )
}
