package graft.core

/**
 * One-pass token statistics kernel: token count, total token chars, and
 * per-language stopword hit counts, from a single scan of the UTF-8
 * bytes. Replaces five interpreted higher-order `filter(...,
 * array_contains)` passes per row in the text-analysis pipeline.
 *
 * Tokenization matches Java regex `\s+` splitting (ASCII whitespace);
 * "chars" are Unicode code points (UTF-8 non-continuation bytes), so the
 * results equal `length()` semantics on the token strings.
 */
object TextStatsCore {

  /** Language order is fixed and alphabetical; index = position here. */
  val langs: Vector[String] = Vector("de", "en", "es", "fr", "zh")

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en", "por", "para"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "不"),
  )

  private val sets: Array[java.util.HashSet[String]] = langs.map { l =>
    val s = new java.util.HashSet[String]()
    stopwords(l).foreach(w => s.add(w))
    s
  }.toArray

  /** Number of ints in the result: 5 lang hits + n_tokens + sum_chars. */
  final val Width = 7

  /** Number of ints in [[repetition]]'s result. */
  final val RepWidth = 5

  /**
   * One-pass repetition kernel: [n_tokens, n_distinct_tokens,
   * top_token_count, n_bigrams, top_bigram_count]. Tokens are
   * case-sensitive whitespace tokens (matching `split(text, "\\s+")` +
   * non-empty filter); bigram semantics mirror the truncating shingle
   * construction used everywhere else (0- and 1-token docs yield one
   * degenerate "bigram", so n_bigrams = max(n_tokens - 1, 1)). Replaces
   * the O(distinct × len) interpreted higher-order-function mode counts,
   * which at sf0.1 cost ~30 s of per-row lambda interpretation.
   */
  def repetition(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](RepWidth)
    val len = bytes.length
    def isSpace(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    val wordCounts = new java.util.HashMap[String, Integer]()
    val bigramCounts = new java.util.HashMap[String, Integer]()
    var topWord = 0
    var topBigram = 0
    var prev: String = null
    var i = 0
    while (i < len) {
      if (!isSpace(bytes(i))) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        val tok = new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.UTF_8)
        out(0) += 1
        val wc = wordCounts.merge(tok, 1, (a, b) => a + b)
        if (wc > topWord) topWord = wc
        if (prev != null) {
          // tokens never contain whitespace, so "w1 w2" is unambiguous
          // and equals the concat_ws form the oracle recomputes
          val bc = bigramCounts.merge(prev + " " + tok, 1, (a, b) => a + b)
          if (bc > topBigram) topBigram = bc
        }
        prev = tok
      } else i += 1
    }
    out(1) = wordCounts.size
    out(2) = topWord
    if (out(0) >= 2) {
      out(3) = out(0) - 1
      out(4) = topBigram
    } else {
      // truncating-shingle degenerate case: one pseudo-bigram (the lone
      // token, or the empty string for an empty doc), occurring once
      out(3) = 1
      out(4) = 1
    }
    out
  }

  def stats(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](Width)
    val len = bytes.length
    def isSpace(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    var i = 0
    while (i < len) {
      if (!isSpace(bytes(i))) {
        val start = i
        var chars = 0
        while (i < len && !isSpace(bytes(i))) {
          if ((bytes(i) & 0xc0) != 0x80) chars += 1
          i += 1
        }
        out(5) += 1      // n_tokens
        out(6) += chars  // sum of token lengths in code points
        val tok = new String(bytes, start, i - start,
          java.nio.charset.StandardCharsets.UTF_8).toLowerCase
        var l = 0
        while (l < 5) {
          if (sets(l).contains(tok)) out(l) += 1
          l += 1
        }
      } else i += 1
    }
    out
  }
}
