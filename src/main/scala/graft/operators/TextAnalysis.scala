package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline (north-star
  * requirement): language-ID heuristic, quality scoring, token stats,
  * fingerprinting. All row-local scalars — linear scale-out, no
  * shuffles beyond the caller's aggregations. */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword langid
    * heuristic (the 5 langs present in the testdata corpus). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "a", "in", "that"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est"),
    "es" -> Seq("el", "la", "los", "y", "de", "que", "es", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Count of whole-word stopword hits (incl. repeats) for one
    * language. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(split(lower(text), "\\s+"), t => array_contains(sw, t)))
  }

  /** Language-ID heuristic: argmax over per-language stopword hit
    * counts; 'und' when nothing matches. Deterministic tie-break by
    * language code order. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = array(langs.map(l =>
      struct(stopwordHits(text, l).as("hits"), lit(l).as("lang"))): _*)
    val best = array_max(scored) // max by (hits, lang)
    when(best.getField("hits") <= 0, "und").otherwise(best.getField("lang"))
  }

  /** Quality signals (length / punctuation / stopword / digit ratios)
    * — the standard cheap pre-training text filters. */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def digitRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  def meanWordLength(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards sentence-like length
    * and stopword presence, penalizes punct/digit noise. Weights are
    * engine policy (no reference counterpart). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val sw = least(stopwordRatio(text) * 4.0, lit(1.0))
    val noise = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0 - digitRatio(text) * 2.0)
    round(lenScore * 0.3 + sw * 0.3 + noise * 0.4, 6)
  }

  /** Per-document stat projection used by the corpus-stats queries. */
  def docStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_subwords", subwordCount(col(textCol)))
      .withColumn("mean_word_len", meanWordLength(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
}
