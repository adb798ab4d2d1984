package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language id, document fingerprinting. All pure column
  * algebra except the rolling-hash fingerprint (one scalar UDF); everything
  * runs as a single codegen'd projection over the documents scan — no
  * shuffle at all, which is the point at 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count (trimmed; empty text → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Lowercase-alnum-run token count — the ONE definition shared by
    * txt_stats, stratified sampling and shard packing (their DuckDB
    * oracles mirror this exact expression; a drift in any copy would
    * silently break parity, so there are no copies).
    */
  def alnumTokenCount(text: Column): Column =
    size(Dedup.tokens(text)).cast("long")

  /** BPE-ish subword count: alnum runs count ~1 token per 4 chars (ceil),
    * punctuation runs 1 each — a cheap, deterministic estimator of
    * tokenizer output length used for budget accounting.
    */
  def tokenEstimate(text: Column): Column = {
    val words = filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)
    val wordToks = aggregate(words, lit(0L), (acc, w) => acc + ceil(length(w) / 4.0).cast("long"))
    // one codegen'd regexp_replace pass, NOT a per-character array with an
    // interpreted rlike per element (that materialized a length(text)
    // array and ran length(text) regex matches per row — orders of
    // magnitude more work on the long documents this budget estimator is
    // for); the length difference counts exactly the same \p{Punct} chars
    val punct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    (wordToks + punct.cast("long")).as("token_estimate")
  }

  /** Quality signals: length, token count, mean word length, punctuation
    * ratio, digit ratio, uppercase ratio, stopword ratio — the standard
    * heuristic feature row (Gopher/C4-style rules are thresholds on these).
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val nonEmpty = len > 0
    def ratio(pattern: String): Column =
      when(!nonEmpty, lit(0.0))
        .otherwise((len - length(regexp_replace(text, pattern, ""))) / len)
    val toks = tokenCount(text)
    Seq(
      "n_chars" -> length(text).cast("long"),
      "n_tokens" -> toks.cast("long"),
      "mean_word_len" -> when(toks === 0, lit(0.0)).otherwise(
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") / toks),
      "punct_ratio" -> ratio("[\\p{Punct}]"),
      "digit_ratio" -> ratio("[0-9]"),
      "upper_ratio" -> ratio("[A-Z]"),
      "stopword_ratio" -> stopwordRatio(text)
    )
  }

  /** Composite quality score in [0,1]: fraction of heuristic rules passed. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val rules = Seq(
      f("n_tokens") >= 5,
      f("mean_word_len").between(2.0, 12.0),
      f("punct_ratio") < 0.3,
      f("digit_ratio") < 0.3,
      f("upper_ratio") < 0.4
    )
    rules.map(r => when(r, 1.0).otherwise(0.0)).reduce(_ + _) / rules.size
  }

  private val EnStop = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
  private val StopSets: Map[String, Seq[String]] = Map(
    "en" -> EnStop,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "del", "en", "que", "por")
  )

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = Dedup.tokens(text)
    val stops = StopSets.getOrElse(lang, EnStop)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stops.map(lit): _*))).cast("double") / size(toks))
  }

  /** Language id by stopword voting: argmax over per-language stopword hit
    * counts; "und" (undetermined) when nothing matches. An n-gram model
    * would go the same way — per-row column algebra, no shuffle.
    */
  def languageId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val scores = StopSets.toSeq.map { case (lang, stops) =>
      struct(
        size(filter(toks, t => t.isin(stops.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Gopher-style repetition signals per document: total/distinct token
    * counts, the most frequent word bigram (occurrence count over the raw
    * bigram stream, NOT the distinct set) and its share of all bigrams.
    * High top-bigram share or low distinct-token ratio are the standard
    * "repetitious document" quality filters.
    *
    * Scale shape: both aggregates are hash aggregates keyed by doc id
    * (map-side combined) over the relational token/shingle streams — no
    * window wider than one document, no all-pairs anything. Argmax ties
    * break lexicographically-largest via struct max, mirrored in the
    * oracle SQL's (count DESC, bigram DESC) ordering.
    */
  def repetitionSignals(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"))
    val bigrams = Dedup.shingleRowsRaw(docs, idCol, textCol, n = 2)
      .groupBy(col("id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(struct(col("c"), col("sh"))).as("top"),
        sum(col("c")).as("total"))
      .select(col("id"), col("top.sh").as("top_bigram"),
        (col("top.c").cast("double") / col("total")).as("top_bigram_frac"))
    docs.select(col(idCol).as("id"))
      .join(toks, Seq("id"), "left")
      .join(bigrams, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_distinct").cast("double") / col("n_tokens"))
          .as("distinct_ratio"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** Composed quality-filter verdicts — the keep/drop pipeline stage a
    * training-data run applies before tokenization (CCNet/Gopher-style
    * rule stacks). Every rule is a named 0/1 column, `keep` their
    * conjunction, and `reasons` the comma-joined failed rules in a fixed
    * order — auditable filtering, not a bare boolean. Reuses the ONE
    * definition of each signal ([[qualityFeatures]],
    * [[repetitionSignals]]) so the verdicts can't drift from the
    * reported stats. Cost: the per-row feature projection plus
    * repetitionSignals' bigram aggregate — nothing else shuffles.
    */
  def filterVerdicts(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val f = qualityFeatures(col(textCol)).toMap
    val rowRules: Seq[(String, Column)] = Seq(
      "min_tokens" -> (f("n_tokens") >= 5),
      "word_len" -> f("mean_word_len").between(2.0, 12.0),
      "punct" -> (f("punct_ratio") < 0.3),
      "digit" -> (f("digit_ratio") < 0.3),
      "upper" -> (f("upper_ratio") < 0.4))
    val repRules: Seq[(String, Column)] = Seq(
      "repetition" -> (col("top_bigram_frac") <= 0.2),
      "distinct" -> (col("distinct_ratio") >= 0.3))
    val base = docs.select(
      col(idCol) +: rowRules.map { case (n, c) => c.as("r_" + n) }: _*)
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col(idCol), col("distinct_ratio"), col("top_bigram_frac"))
    val names = (rowRules ++ repRules).map(_._1)
    val flags = names.map(n => col("r_" + n))
    base.join(
        rep.select(col(idCol) +: repRules.map { case (n, c) => c.as("r_" + n) }: _*),
        Seq(idCol))
      .select(
        col(idCol) +:
          names.map(n => col("r_" + n).cast("long").as("r_" + n)) :+
          flags.reduce(_ && _).cast("long").as("keep") :+
          concat_ws(",", names.map(n => when(!col("r_" + n), lit(n))): _*).as("reasons"): _*)
  }

  /** Rolling FNV-1a document fingerprint — stable across runs, usable as
    * a cheap content id. Driver-side Scala form (chars; equals the column
    * form for ASCII text).
    */
  val rollingFingerprint: String => Long = { s =>
    var h = 0xcbf29ce484222325L // FNV-1a offset basis (hex: decimal overflows)
    if (s != null) {
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    }
    h
  }

  /** Column form: a native Catalyst expression with codegen (stays inside
    * the whole-stage loop; a UDF would break the codegen span).
    */
  def fingerprint(text: Column): Column =
    graft.functions.expressions.TextExpressions.fnvFingerprint(text)
}
