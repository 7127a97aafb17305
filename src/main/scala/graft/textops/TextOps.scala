package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents(doc_id, text, lang, source, n_chars)` table: token statistics, quality
  * scoring, language identification, document fingerprinting.
  *
  * All pure column expressions (whole-stage-codegen'd; no UDFs), deterministic, and
  * embarrassingly parallel — each is a single projection or hash aggregation, so the
  * 100 TB shape is one parquet scan with full column pruning.
  */
object TextOps {

  /** Whitespace tokens of trimmed text (the cheap token-count path; a BPE-ish subword
    * estimate is `bpeTokenEstimate`).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Per-document token statistics: (doc_id, tokens, chars, avg_token_len). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).cast("long").as("tokens"),
      length(col("text")).cast("long").as("chars"),
      round(length(translate(trim(col("text")), " \t\n", "")).cast("double") / size(t), 8)
        .as("avg_token_len")
    )
  }

  /** BPE-ish subword count estimate: words are split into ~4-char subword units, plus
    * one unit per non-alphanumeric symbol — a deterministic stand-in for a real BPE
    * vocab (the plumbing and cost model match; swap the expression for a broadcast
    * vocab join when a real tokenizer lands).
    */
  def bpeTokenEstimate(docs: DataFrame): DataFrame = {
    val words = tokens(col("text"))
    docs.select(
      col("doc_id"),
      aggregate(
        transform(words, w => ceil(length(w).cast("double") / 4.0).cast("long")),
        lit(0L),
        (acc, x) => acc + x
      ).as("bpe_tokens")
    )
  }

  private val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Quality signals per document: stopword ratio, punctuation ratio, mean token
    * length, plus a composite score in [0,1] (heuristics in the spirit of public
    * web-corpus quality filters: C4/Gopher-style length+symbol+stopword rules).
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val stopHits = size(filter(t, w => lower(w).isInCollection(StopwordsEn))).cast("double")
    val punct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
    docs.select(
      col("doc_id"),
      round(stopHits / nTok, 8).as("stopword_ratio"),
      round(punct / length(col("text")).cast("double"), 8).as("punct_ratio"),
      round((nTok / (nTok + lit(100.0))) * (lit(1.0) - punct / length(col("text"))), 8)
        .as("quality_score")
    )
  }

  private val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "con", "por")
  )

  /** Language identification: CJK-script detection for zh, else argmax of per-language
    * stopword hits with a fixed priority order (en > de > fr > es) on ties —
    * deterministic and SQL-expressible (the oracle mirrors the same CASE ladder).
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = transform(tokens(col("text")), w => lower(w))
    def hits(lang: String): Column =
      size(filter(t, w => w.isInCollection(LangStopwords(lang)))).cast("long")
    val en = hits("en"); val de = hits("de"); val fr = hits("fr"); val es = hits("es")
    docs.select(
      col("doc_id"),
      when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
        .when(en >= de && en >= fr && en >= es, lit("en"))
        .when(de >= fr && de >= es, lit("de"))
        .when(fr >= es, lit("fr"))
        .otherwise(lit("es"))
        .as("predicted_lang")
    )
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text — the
    * canonical-form key for exact dedup across formatting variants.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
}
