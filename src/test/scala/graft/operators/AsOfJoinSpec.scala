package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks the latest right row at or before left ts, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0),
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote → 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // exactly at 11:00 → 110 (<= semantics)
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote → dropped
      (2L, ts("2024-01-01 12:00:00"), "t4"), // → 200
      (3L, ts("2024-01-01 12:00:00"), "t5"), // no quotes for key → dropped
    ).toDF("key", "tts", "trade_id")
    val got = AsOfJoin.asof(trades, quotes, "key", "tts", "qts", Seq("price"))
      .select($"trade_id", $"price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("t1" -> 100.0, "t2" -> 110.0, "t4" -> 200.0))
  }

  test("asof keeps carried columns row-atomic when some are NULL") {
    // right row at 15 carries (tag=NULL, v=200): a left row after it must
    // receive BOTH from that row — not tag from the older row at 5 —
    // and a NULL in the first carried column must not drop the match
    val left = Seq((1L, 10L), (1L, 20L)).toDF("key", "lts")
    val right = Seq(
      (1L, 5L, Option("x"), 100),
      (1L, 15L, Option.empty[String], 200),
    ).toDF("key", "rts", "tag", "v")
    val got = AsOfJoin.asof(left, right, "key", "lts", "rts", Seq("tag", "v"))
      .orderBy("lts").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("tag") == "x" && got(0).getAs[Int]("v") == 100)
    assert(got(1).getAs[String]("tag") == null && got(1).getAs[Int]("v") == 200,
      s"mixed-row fill: ${got(1)}")
  }

  test("asof plans one exchange on the key (window shuffle only)") {
    val l = spark.range(100).select($"id".as("key"), $"id".cast("timestamp").as("lts"))
    val r = spark.range(50).select($"id".as("key"), $"id".cast("timestamp").as("rts"),
      ($"id" * 2).as("v"))
    val plan = AsOfJoin.asof(l, r, "key", "lts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("approx_count_distinct stays within 5% of exact (pinned for a31)") {
    val li = spark.read.parquet(s"${SparkTestSession.sf0001}/lineitem.parquet")
    val r = li.agg(approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
  }
}
