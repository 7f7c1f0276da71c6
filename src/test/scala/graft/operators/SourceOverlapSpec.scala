package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** d78/d79's matrix operator: hand-computed semantics on synthetic
  * pairs, the integer strong-tier boundary, and the exact-vs-MinHash
  * twin agreement on the gate corpora. */
class SourceOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("groupOverlapMatrix semantics on hand-computed pairs") {
    // sources: A = {1, 2}, B = {3, 4}, C = {5}
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "C"))
      .toDF("doc_id", "source")
    // pairs: A–B twice (docs 1-3, 2-3), A–A once (1-2, strong: 4/5
    // exactly), B–C once (4-5, just below strong: 7/9)
    val pairs = Seq(
      (1L, 3L, 1L, 2L), (2L, 3L, 1L, 2L),
      (1L, 2L, 4L, 5L),
      (4L, 5L, 7L, 9L)).toDF("i", "j", "inter", "uni")
    val m = Dedup.groupOverlapMatrix(pairs, docs, "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m == Map(
      // diagonal: both doc counts are the union of touched A docs
      ("A", "A") -> ((1L, 1L, 2L, 2L)),
      // doc 3 is the only B doc touched from the A side; 1 and 2 on A's
      ("A", "B") -> ((2L, 0L, 2L, 1L)),
      ("B", "C") -> ((1L, 0L, 1L, 1L))))
  }

  test("strong tier is decided in integers at the 0.8 boundary") {
    val docs = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "source")
    def one(inter: Long, uni: Long) =
      Dedup.groupOverlapMatrix(
        Seq((1L, 2L, inter, uni)).toDF("i", "j", "inter", "uni"),
        docs, "doc_id", "source").select("n_strong").head().getLong(0)
    assert(one(4, 5) == 1L)   // exactly 4/5 → strong
    assert(one(79, 99) == 0L) // 79/99 ≈ 0.7979 → not strong
    assert(one(80, 99) == 1L) // 80/99 ≈ 0.8081 → strong
  }

  test("MinHash twin matches the exact matrix on the gate corpora") {
    // the d79-vs-d78 production-twin pin: banding recalls every ≥0.5
    // pair on these corpora (the measured d67 equivalence), so the two
    // matrices must be identical rows
    Seq(SparkTestSession.sf0001, SparkTestSession.sf001).foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def rows(p: org.apache.spark.sql.DataFrame) =
        Dedup.groupOverlapMatrix(p, docs, "doc_id", "source")
          .collect().map(_.toSeq).toSet
      val exact = rows(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
      val banded = rows(Dedup.minhashNearDupStats(docs, "doc_id", "text", 0.5))
      assert(exact.nonEmpty, s"$dir produced an empty overlap matrix")
      assert(banded == exact, s"$dir: MinHash matrix diverges from exact")
      spark.catalog.clearCache()
    }
  }

  test("the matrix plan stays output-sensitive: no cartesian product") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val plan = Dedup.groupOverlapMatrix(
      Dedup.minhashNearDupStats(docs, "doc_id", "text", 0.5),
      docs, "doc_id", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"overlap matrix plans a cartesian product:\n$plan")
    spark.catalog.clearCache()
  }

  test("d80 funnel rows are stage-monotone and non-vacuous") {
    // each cleaning stage can only remove docs, and the gate corpora
    // must actually exercise the quality and near-dup stages (a funnel
    // where nothing is ever dropped would be a vacuous report)
    val rows = graft.SparkEntry.queries("d80_curation_funnel")(
      spark, graft.SparkTestSession.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(d, q, e, n, f) = (1 to 5).map(r.getLong).toSeq
      assert(d >= q && q >= e && e >= n && n >= f,
        s"non-monotone funnel row: $r")
      assert(r.getLong(6) >= f, s"fewer tokens than docs in $r")
    }
    assert(rows.map(_.getLong(1)).sum > rows.map(_.getLong(2)).sum,
      "quality stage dropped nothing anywhere — vacuous funnel")
    assert(rows.map(_.getLong(3)).sum > rows.map(_.getLong(4)).sum,
      "near-dup stage dropped nothing anywhere — vacuous funnel")
    spark.catalog.clearCache()
  }

  test("groupOverlapMatrix: a NULL group fails loudly instead of folding into the diagonal") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L, 4L, 5L)).toDF("i", "j", "inter", "uni")
    val docs = Seq((1L, Some("web")), (2L, Option.empty[String])).toDF("doc_id", "source")
    val ex = intercept[Exception] {
      Dedup.groupOverlapMatrix(pairs, docs, "doc_id", "source").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val msg = messages(ex).mkString(" | ")
    assert(msg.contains("groupOverlapMatrix") && msg.contains("doc_id=2"),
      s"unexpected failure: $msg")
  }
}
