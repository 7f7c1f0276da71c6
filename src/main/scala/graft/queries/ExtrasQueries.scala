package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, SlotPartitioning}
import graft.sources.Tables

/**
 * Multimodal plumbing and slot-aware layout as driver-checkable queries.
 * The multimodal oracles recompute the stub kernels (byte histograms,
 * frame checksums) from `ord()` folds in DuckDB — fully independent.
 */
object ExtrasQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + typed metadata + native feature expression.
    "m50_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.synthesizeMedia(t(s, dir, "documents"))
      media.select($"doc_id", $"kind",
          length($"payload").cast("long").as("n_bytes"),
          Multimodal.media_features($"payload").as("f"))
        .select($"doc_id", $"kind", $"n_bytes",
          element_at($"f", 1).as("f0"), element_at($"f", 2).as("f1"),
          element_at($"f", 3).as("f2"), element_at($"f", 4).as("f3"))
        .orderBy("doc_id")
    }),
    // Frame sampling over "video" payloads.
    "m51_frame_checksums" -> ((s, dir) => {
      import s.implicits._
      Multimodal.synthesizeMedia(t(s, dir, "documents"))
        .where($"kind" === "video")
        .select($"doc_id", posexplode(Multimodal.frame_checksums($"payload", 4)))
        .select($"doc_id", $"pos".cast("int").as("frame_idx"), $"col".as("fp"))
        .orderBy("doc_id", "frame_idx")
    }),
    // Typed UDAF: exact distinct-slot occupancy per node via a 16384-bit
    // bitmap aggregator (merge = bitwise OR, no dedup shuffle).
    "p10_slot_occupancy" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}
      t(s, dir, "orders")
        .select(concat(lit("order:"), $"o_orderkey").as("key"))
        .select(cluster_node($"key").as("node"), cluster_slot($"key").as("slot"))
        .groupBy("node")
        .agg(graft.functions.SlotBitmapAgg.distinct_slots($"slot").as("occupied_slots"),
          count(lit(1)).as("keys"))
        .orderBy("node")
    }),
    // Slot-aware layout analysis: per-node balance + share of keys.
    "p08_node_balance" -> ((s, dir) => {
      import s.implicits._
      SlotPartitioning.nodeBalance(
          t(s, dir, "customer"), concat(lit("user:"), $"c_custkey"))
        .select($"node", $"keys", $"distinct_slots", round($"share", 6).as("share"))
        .orderBy("node")
    }),
  )

  // ASCII-corpus assumption (same caveat as DuckSql's CRC16 oracle): the
  // m50/m51 oracles fold ord() CODE POINTS while the Scala kernels
  // (byteHistogram, frameChecksums) fold UTF-8 BYTES — equal only while
  // `documents.text` is pure ASCII (the driver corpus is). Non-ASCII
  // parity is covered by byte-level unit tests in MultimodalSpec.
  private val duckCodes =
    "list_transform(range(1, length(text)+1), i -> ord(substr(text, i, 1)))"

  val oracles: Map[String, String] = Map(
    "m50_media_features" ->
      s"""WITH b AS (SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  text, CAST(length(text) AS BIGINT) AS n_bytes, $duckCodes AS codes
         | FROM documents)
         |SELECT doc_id, kind, n_bytes,
         | CAST(len(list_filter(codes, c -> c >= 32 AND c < 64)) AS DOUBLE) / greatest(n_bytes, 1) AS f0,
         | CAST(len(list_filter(codes, c -> c >= 64 AND c < 96)) AS DOUBLE) / greatest(n_bytes, 1) AS f1,
         | CAST(len(list_filter(codes, c -> c >= 96 AND c < 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f2,
         | CAST(len(list_filter(codes, c -> c < 32 OR c >= 128)) AS DOUBLE) / greatest(n_bytes, 1) AS f3
         |FROM b ORDER BY doc_id""".stripMargin,
    "m51_frame_checksums" ->
      """WITH v AS (SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, unnest(range(0, 4)) AS frame_idx, text, n FROM v)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(range(frame_idx*n//4 + 1, (frame_idx+1)*n//4 + 1),
        |     j -> CAST(ord(substr(text, j, 1)) AS BIGINT))),
        |   (a, b) -> a + b) % 65521 AS BIGINT) AS fp
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "p10_slot_occupancy" -> {
      val inner = graft.oracle.DuckSql.withSlotNode(
        "SELECT 'order:' || o_orderkey AS key FROM orders",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(DISTINCT slot) AS occupied_slots, count(*) AS keys
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
    "p08_node_balance" -> {
      val inner = graft.oracle.DuckSql.withSlotNode(
        "SELECT 'user:' || c_custkey AS key FROM customer",
        Seq(), Some("slot"), Some("node"))
      s"""SELECT node, count(*) AS keys, count(DISTINCT slot) AS distinct_slots,
         | round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS share
         |FROM ($inner) GROUP BY node ORDER BY node""".stripMargin
    },
  )
}
