package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: tokenization
 * counts, quality scoring, stopword-based language ID, document
 * fingerprints. All pure `functions._` column expressions (no UDFs) so
 * they stay inside whole-stage codegen — at 100 TB these run as narrow
 * map transforms over the scan with zero shuffles.
 *
 * Determinism: every ratio is an int/int division performed in DOUBLE,
 * the same IEEE op in any engine — results hash-match the DuckDB oracle.
 */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > lit(0))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /**
   * BPE-ish sub-word unit count: alpha runs, single digits, and single
   * punctuation marks each count as one unit (a cheap proxy for tokenizer
   * cost accounting).
   */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  /** Ratio of non-alphanumeric-non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length (chars per token). */
  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    length(concat_ws("", t)).cast("double") / greatest(size(t), lit(1)).cast("double")
  }

  /** Stopword lists used for both quality scoring and language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en", "por", "para"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "不"),
  )

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val stops = array(stopwords(lang).map(lit): _*)
    val t = tokens(text)
    size(filter(t, w => array_contains(stops, lower(w)))).cast("double") /
      greatest(size(t), lit(1)).cast("double")
  }

  /**
   * Heuristic quality score in [0,1]: rewards mid-length docs, some
   * stopword mass, low punctuation noise. Weights are arbitrary but
   * fixed; the point is a deterministic, cheap, scan-local signal.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(4.0), lit(1.0))
    lenScore * lit(0.4) + stopScore * lit(0.4) + (lit(1.0) - punctPenalty) * lit(0.2)
  }

  /** Per-language stopword hit counts, as score columns. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val stops = array(words.map(lit): _*)
      lang -> size(filter(t, w => array_contains(stops, lower(w))))
    }
  }

  /**
   * Argmax over (score, precedence, label) structs: `array_max` compares
   * fields lexicographically, so the winner is the highest score, ties
   * broken by earliest language (largest -index), all-zero → "und"
   * (index 0 outranks every language's negative index at score 0). Each
   * score subtree appears exactly once — a when/otherwise fold would
   * duplicate earlier scores exponentially in the optimized plan.
   */
  private def argmaxLang(scores: Seq[(String, Column)]): Column =
    array_max(array(
      struct(lit(0).as("s"), lit(0).as("p"), lit("und").as("l")) +:
        scores.zipWithIndex.map { case ((lang, s), i) =>
          struct(s.as("s"), lit(-(i + 1)).as("p"), lit(lang).as("l"))
        }: _*)).getField("l")

  /**
   * N-gram/stopword language ID: argmax of per-language stopword hits,
   * ties broken by fixed alphabetical precedence, no hits → "und"
   * (undetermined). A real pipeline would use char n-gram profiles; the
   * shape (scan-local scoring + argmax) is identical.
   */
  def langId(text: Column): Column = argmaxLang(langScores(text))

  /**
   * Full per-document text-statistics projection, staged so each
   * expensive intermediate is evaluated once per row:
   *   stage 1 materializes the token array; stage 2 the per-language hit
   *   counts; stage 3 derives ratios/score/language from plain columns.
   * A nondeterministic barrier column between stages stops
   * CollapseProject from inlining the intermediates back into every
   * consumer (higher-order functions are excluded from Spark's
   * subexpression elimination, so inlining would re-tokenize per stat).
   */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val toks = col("__toks")
    val langs = stopwords.keys.toSeq.sorted
    val stage1 = df
      .withColumn("__toks", tokens(c))
      .withColumn("__b1", monotonically_increasing_id())
    val stage2 = langs.foldLeft(stage1) { case (d, lang) =>
      val stops = array(stopwords(lang).map(lit): _*)
      d.withColumn(s"__hits_$lang", size(filter(toks, w => array_contains(stops, lower(w)))))
    }
      .withColumn("__n_tokens", size(toks))
      .withColumn("__sumlen", length(concat_ws("", toks)))
      .withColumn("__b2", monotonically_increasing_id())
    val nToks = greatest(col("__n_tokens"), lit(1)).cast("double")
    val swRatio = col("__hits_en").cast("double") / nToks
    val pRatio = punctRatio(c)
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(swRatio * lit(5.0), lit(1.0))
    val punctPenalty = least(pRatio * lit(4.0), lit(1.0))
    stage2
      .withColumn("n_tokens", col("__n_tokens").cast("long"))
      .withColumn("n_bpeish", bpeishCount(c))
      .withColumn("avg_word_len", col("__sumlen").cast("double") / nToks)
      .withColumn("punct_ratio", pRatio)
      .withColumn("stopword_ratio", swRatio)
      .withColumn("quality",
        lenScore * lit(0.4) + stopScore * lit(0.4) + (lit(1.0) - punctPenalty) * lit(0.2))
      .withColumn("lang_pred", argmaxLang(langs.map(l => l -> col(s"__hits_$l"))))
      .drop("__toks", "__b1", "__b2", "__n_tokens", "__sumlen")
      .drop(langs.map(l => s"__hits_$l"): _*)
  }
}
