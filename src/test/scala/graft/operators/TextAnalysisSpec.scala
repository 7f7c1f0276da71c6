package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.core.TextHash

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token counts and ratios on known inputs") {
    val df = Seq(
      ("the cat sat on the mat", 6L, 0.0),
      ("hello, world!!", 2L, 3.0 / 14.0),
      ("", 0L, 0.0),
      ("  spaced   out  ", 2L, 0.0),
    ).toDF("text", "want_tokens", "want_punct")
    df.select(TextAnalysis.tokenCount($"text").as("t"), $"want_tokens",
        TextAnalysis.punctRatio($"text").as("p"), $"want_punct")
      .collect().foreach { r =>
        assert(r.getLong(0) == r.getLong(1))
        assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
      }
  }

  test("bpe-ish counting: alpha runs, digits, punct marks") {
    val got = Seq("abc 12 x!y").toDF("text")
      .select(TextAnalysis.bpeishCount($"text")).head().getLong(0)
    // abc, 1, 2, x, !, y
    assert(got == 6L)
  }

  test("langId picks the language with most stopword hits, und when none") {
    val df = Seq(
      ("the cat is on a mat and the dog", "en"),
      ("der hund ist ein tier und das haus", "de"),
      ("le chat est dans la maison et les arbres", "fr"),
      ("el perro y el gato es un animal en casa", "es"),
      ("zzz qqq xxx", "und"),
    ).toDF("text", "want")
    df.select(TextAnalysis.langId($"text").as("got"), $"want").collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), s"for want=${r.getString(1)}")
    }
  }

  test("quality score is in [0,1] and penalizes noise") {
    val rows = Seq(
      "the project is on track and the data is clean for training runs",
      "!!!! ???? @@@@ #### $$$$ %%%%",
    ).toDF("text").select(TextAnalysis.qualityScore($"text").as("q")).collect()
    val Array(good, noisy) = rows.map(_.getDouble(0))
    assert(good > noisy)
    rows.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }

  test("pii scrub counts and redacts emails, ips and phones") {
    val got = TextAnalysis.scrubPii(TextAnalysis.piiFixtures.toDF("doc_id", "text"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "text_clean")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(-3L) == ((0L, 2L, 1L,
      "escalate to ops: primary <IP> fallback <IP> pager <PHONE>")))
    assert(got(-2L) == ((2L, 0L, 0L,
      "contact <EMAIL> or <EMAIL> about the invoice")))
    assert(got(-1L) == ((0L, 0L, 0L,
      "no sensitive content in this row, plain words only")))
  }

  test("rolling fingerprint: equal texts agree, shifted text keeps min window") {
    val base = "the quick brown fox jumps over the lazy dog"
    val fp = TextHash.rollingMin(base.getBytes("UTF-8"), 8)
    assert(fp == TextHash.rollingMin(base.getBytes("UTF-8"), 8))
    // prefixing content preserves the minimizing window w.h.p.
    val shifted = TextHash.rollingMin(("PREFIX " + base).getBytes("UTF-8"), 8)
    assert(shifted <= fp)
    // expression agrees with the core
    val got = Seq(base).toDF("text")
      .select(graft.functions.TextFunctions.rolling_fingerprint($"text")).head().getLong(0)
    assert(got == fp)
  }

  test("analyze stays codegen'd (no UDF nodes in the plan)") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
    val plan = TextAnalysis.analyze(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("repetition stats match hand-computed values") {
    val df = Seq(
      (1L, "a a a a"),     // 1 type / 4 tokens; "a"×4; bigrams "a a"×3
      (2L, "a b c d"),     // all distinct; 3 distinct bigrams
      (3L, "x y x y x"),   // 2/5 types; "x"×3; bigrams: "x y"×2 of 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df)
      .select("doc_id", "n_tokens", "uniq_ratio", "top_word_frac", "top_bigram_frac")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    assert(r(1L) == ((4L, 0.25, 1.0, 1.0)))
    assert(r(2L) == ((4L, 1.0, 0.25, 1.0 / 3)))
    assert(r(3L) == ((5L, 0.4, 0.6, 0.5)))
  }

  test("chunking: window/stride counts, overlap, short-doc and empty-doc edges") {
    val df = Seq(
      (1L, (1 to 12).map(i => s"t$i").mkString(" ")), // 12 tokens, w=5 s=4 → ceil(7/4)+1 = 3 chunks
      (2L, "a b c"),                                  // short → 1 chunk of 3
      (3L, ""),                                       // empty → 1 chunk of 0
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunk(df, "doc_id", "text", window = 5, stride = 4)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(rows.count(_._1 == 1L) == 3)
    assert(rows.filter(_._1 == 1L).map(_._4) == Seq(
      "t1 t2 t3 t4 t5", "t5 t6 t7 t8 t9", "t9 t10 t11 t12"))
    assert(rows.filter(_._1 == 1L).map(_._3) == Seq(5L, 5L, 4L))
    assert(rows.filter(_._1 == 2L) == Seq((2L, 0L, 3L, "a b c")))
    assert(rows.filter(_._1 == 3L) == Seq((3L, 0L, 0L, "")))
  }

  test("LM cross-entropy: hand-checked unigram model; bigram NULL for 1-token docs") {
    // corpus: "a a b" + "a" → unigram counts a=3, b=1, total=4
    // doc 1 terms: log2(3/4), log2(3/4), log2(1/4); doc 2: log2(3/4)
    val df = Seq((1L, "a a b"), (2L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(df).orderBy("doc_id").collect()
    val h1 = -(2 * math.log(3.0 / 4) / math.log(2) + math.log(1.0 / 4) / math.log(2)) / 3
    val h2 = -math.log(3.0 / 4) / math.log(2)
    assert(out(0).getLong(1) == 3 && math.abs(out(0).getDouble(2) - h1) < 1e-6, out(0))
    assert(out(1).getLong(1) == 1 && math.abs(out(1).getDouble(2) - h2) < 1e-6, out(1))
    // 1-token doc has no bigrams → NULL h_bigram; doc 1's bigram model
    // over the corpus: (a,a)=1, (a,b)=1 → P=1/2 each → h_bigram = 1.0
    assert(out(1).isNullAt(3), out(1))
    assert(math.abs(out(0).getDouble(3) - 1.0) < 1e-6, out(0))
  }

  test("LM cross-entropy separates in-distribution from out-of-distribution docs") {
    val docs = spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    // an OOV-free but maximally atypical doc: one rare-ish word repeated
    // still scores; the real check is that corpus docs land in a sane
    // band (0 < H ≤ log2(vocab)) and the score is deterministic
    val out = TextAnalysis.lmCrossEntropy(docs)
    val stats = out.agg(min($"h_unigram"), max($"h_unigram"), count(lit(1))).head()
    assert(stats.getLong(2) == docs.count())
    // principled bound, not a fixture-coupled constant: per-token
    // surprisal is at most log2(total/min_count) ≤ log2(total tokens)
    val totalTokens = docs
      .select(sum(TextAnalysis.tokenCount($"text"))).head().getLong(0)
    val hMax = math.log(totalTokens.toDouble) / math.log(2.0)
    assert(stats.getDouble(0) > 0.0 && stats.getDouble(1) <= hMax + 1e-9,
      s"unigram H outside [0, log2($totalTokens)]: $stats")
    val again = TextAnalysis.lmCrossEntropy(docs)
    assert(out.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq, "non-deterministic scores")
  }
}
