package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the fused repetition kernel: byte-level tokenizer +
  * mode counts must equal a straightforward Scala reference on random
  * documents (small vocabulary → real repetition; mixed whitespace and a
  * multi-byte UTF-8 word exercise the tokenizer). */
class TextStatsRepetitionSpec extends AnyFunSuite {
  private def checkProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  private val word = Gen.oneOf("a", "bb", "ccc", "dddd", "éé", "xyz", "a")
  private val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \r ", "", "")

  // empty separators are deliberate: adjacent words fuse into one token,
  // so the reference must tokenize the TEXT (with the same `\s+` regex
  // the Column-API `tokens()` uses) — the property then pins the byte
  // tokenizer against the regex one as well as the mode counts
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 40)
    words <- Gen.listOfN(n, word)
    seps <- Gen.listOfN(n + 1, ws)
  } yield {
    val sb = new StringBuilder
    sb.append(seps.head)
    words.zip(seps.tail).foreach { case (w, s) => sb.append(w).append(s) }
    sb.toString
  }

  private def regexTokens(text: String): List[String] =
    text.split("\\s+").filter(_.nonEmpty).toList

  private def reference(words: List[String]): Array[Int] = {
    val n = words.length
    val wc = words.groupBy(identity).map(_._2.size)
    val bc =
      if (n >= 2) words.sliding(2).map(_.mkString(" ")).toList.groupBy(identity).map(_._2.size)
      else Nil
    Array(n, wc.size, if (n == 0) 0 else wc.max,
      if (n >= 2) n - 1 else 1, if (n >= 2) bc.max else 1)
  }

  test("repetition kernel matches a regex-tokenized reference on random docs") {
    checkProp(Prop.forAll(doc) { text =>
      TextStatsCore.repetition(text.getBytes("UTF-8"))
        .sameElements(reference(regexTokens(text)))
    })
  }

  test("stats and repetition kernels agree on the token count") {
    checkProp(Prop.forAll(doc) { text =>
      TextStatsCore.stats(text.getBytes("UTF-8"))(5) ==
        TextStatsCore.repetition(text.getBytes("UTF-8"))(0)
    })
  }

  test("hashed count vector: one-pass kernel equals per-bucket filtering; totals preserved") {
    checkProp(Prop.forAll(doc) { text =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val v = TextHash.hashedCounts(toks.toArray[AnyRef], 16)
      val ref = Array.tabulate(16)(j =>
        toks.count(t => java.lang.Math.floorMod(TextHash.fnv1a64(t), 16L) == j).toDouble)
      v.sameElements(ref) && v.sum == toks.length.toDouble
    })
  }
}
