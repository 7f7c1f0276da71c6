package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.ClusterHash
import graft.functions.ClusterHashFunctions.{cluster_node, cluster_slot}

class ClusterExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val goldenKeys = Seq("user:1000", "product:5432", "{user:1000}:profile",
    "foo", "bar", "", "{}", "a{b}c", "{{inner}}", "key{", "é{tag}û")

  test("expressions agree with core on golden keys (codegen path)") {
    val df = goldenKeys.toDF("key")
      .select($"key", cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
    df.collect().foreach { r =>
      val k = r.getString(0)
      assert(r.getInt(1) == ClusterHash.getSlot(k), s"slot($k)")
      assert(r.getInt(2) == ClusterHash.getNode(k), s"node($k)")
    }
  }

  test("interpreted eval path agrees with core") {
    goldenKeys.foreach { k =>
      assert(ClusterSlot(Literal(k)).eval() == ClusterHash.getSlot(k))
      assert(ClusterNode(Literal(k)).eval() == ClusterHash.getNode(k))
      assert(ClusterNodeN(Literal(k), Literal(6)).eval() == ClusterHash.getNode(k))
      assert(ClusterNodeN(Literal(k), Literal(3)).eval() ==
        ClusterHash.nodeOfSlotN(ClusterHash.getSlot(k), 3))
    }
  }

  test("NULL in → NULL out") {
    val df = Seq(Some("foo"), None).toDF("key")
      .select(cluster_slot($"key").as("slot"), cluster_node($"key").as("node"))
    val rows = df.collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getInt(0) == 12182))
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("SQL registration: spark.sql path works after register") {
    ClusterHashFunctions.register(spark)
    val row = spark.sql(
      "SELECT cluster_slot('user:1000') AS s, cluster_node('user:1000') AS n, cluster_node('user:1000', 3) AS n3"
    ).head()
    assert(row.getInt(0) == 1649 && row.getInt(1) == 1)
    assert(row.getInt(2) == ClusterHash.nodeOfSlotN(1649, 3))
  }

  test("SQL registration covers the full pipeline-kernel surface") {
    ClusterHashFunctions.register(spark)
    val r = spark.sql(
      """SELECT rolling_fingerprint('the quick brown fox jumps') AS fp,
        |  simhash64(array('a','b','c')) AS sh,
        |  size(shingle_hashes('a b c d', 3)) AS nsh,
        |  element_at(token_stats('the cat sat'), 6) AS ntok,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  element_at(repetition_stats('a a b'), 3) AS topw,
        |  fnv1a64('abc') AS fnv,
        |  fnv1a64_mix('abc') AS fnvm,
        |  size(media_features(cast('abcd' AS BINARY))) AS nf,
        |  size(frame_checksums(cast('abcdefgh' AS BINARY), 4)) AS nfr,
        |  length(media_resize(cast('abcd' AS BINARY), 2, 2, 1, 1)) AS nrz,
        |  size(fingerprint_set('the quick brown fox jumps', 16, 1)) AS nfps,
        |  ahash64(cast('abcdefgh' AS BINARY), 8, 1) AS ah
        |""".stripMargin).head()
    import graft.core.{TextHash, TextStatsCore}
    assert(r.getLong(0) ==
      TextHash.rollingMin("the quick brown fox jumps".getBytes("UTF-8"), 8))
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 2)           // "a b c" and "b c d"
    assert(r.getInt(3) == 3)           // 3 tokens
    assert(r.getDouble(4) == 11.0)
    assert(r.getInt(5) == 2)           // top word "a" occurs twice
    assert(r.getLong(6) == graft.core.TextHash.fnv1a64("abc"))
    assert(r.getLong(7) == graft.core.TextHash.fnv1a64Mixed("abc"))
    assert(r.getInt(8) == 4 && r.getInt(9) == 4 && r.getInt(10) == 1)
    assert(r.getInt(11) ==
      graft.core.TextHash.fingerprintSet(
        "the quick brown fox jumps".getBytes("UTF-8"), 16, 1).length)
    assert(r.getLong(12) ==
      graft.core.MediaCore.aHash64("abcdefgh".getBytes("UTF-8"), 8, 1))
    // shape params must be literals — a column there is a clear error
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', cast(rand()*3 AS INT))").head()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
    // the typed aggregators are SQL-reachable too; NULL hashes ignored
    val kmv = spark.sql(
      "SELECT kmv_distinct(fnv1a64_mix(key)) FROM VALUES ('a'),('b'),('a'),(NULL) AS t(key)"
    ).head().getDouble(0)
    assert(kmv == 2.0)
    val slots = spark.sql(
      "SELECT distinct_slots(cluster_slot(key)) FROM VALUES ('a'),('b'),('a') AS t(key)"
    ).head().getLong(0)
    assert(slots == 2L)
  }

  test("SQL registration covers the sketch/top-k aggregators at default shapes") {
    ClusterHashFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L))
      .toDF("g", "s", "id").createOrReplaceTempView("agg_probe")
    val r = spark.sql(
      """SELECT size(bloom_build(fnv1a64_mix(g))) AS nbloom,
        |  size(cms_build(fnv1a64_mix(g))) AS ncms,
        |  size(top_k_pairs(s, id)) AS ntk,
        |  kmv_distinct(fnv1a64_mix(g)) AS kd
        |FROM agg_probe""".stripMargin).head()
    assert(r.getInt(0) == 1024 / 64)
    assert(r.getInt(1) == 512 * 3)
    assert(r.getInt(2) == 3)
    assert(r.getDouble(3) == 2.0)
    // SQL-built bitmap probed by the SQL-registered native expression:
    // members hit, a non-member key of this tiny set misses
    val probes = spark.sql(
      """WITH bf AS (SELECT bloom_build(fnv1a64_mix(g)) AS b FROM agg_probe)
        |SELECT bloom_might_contain(b, fnv1a64_mix('a'), 1024, 3),
        |       bloom_might_contain(b, fnv1a64_mix('zzz-not-present'), 1024, 3)
        |FROM bf""".stripMargin).head()
    assert(probes.getBoolean(0))
    assert(!probes.getBoolean(1))
  }

  test("literal calls constant-fold in the optimized plan") {
    ClusterHashFunctions.register(spark)
    val qe = spark.sql("SELECT cluster_slot('user:1000') AS s").queryExecution
    val folded = qe.optimizedPlan.expressions.flatMap(_.collect {
      case Literal(v, _) => v
    })
    assert(folded.contains(1649), s"expected Literal(1649) in ${qe.optimizedPlan}")
  }

  test("fresh session without registration fails analysis (quack.test:6-9 pattern)") {
    val fresh = spark.newSession()
    val e = intercept[AnalysisException] {
      fresh.sql("SELECT cluster_slot('foo')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cluster_slot"))
  }

  test("expression survives whole-stage codegen over a real table") {
    val df = spark.read.parquet(s"${SparkTestSession.sf0001}/customer.parquet")
      .select(concat(lit("user:"), $"c_custkey").as("key"))
      .select($"key", cluster_slot($"key").as("slot"))
    // "*(n)" marks operators fused into a WholeStageCodegen stage; the
    // projection carrying cluster_slot must be inside one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [key"), s"plan not codegen'd:\n$plan")
    df.collect().foreach { r =>
      assert(r.getInt(1) == ClusterHash.getSlot(r.getString(0)))
    }
  }

  test("distribution of user:1..1000 via DataFrame matches README golden") {
    val counts = spark.range(1, 1001)
      .select(concat(lit("user:"), $"id").as("key"))
      .select(cluster_node($"key").as("node"))
      .groupBy("node").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 167L, 2 -> 165L, 3 -> 167L, 4 -> 170L, 5 -> 168L, 6 -> 163L))
  }
}
