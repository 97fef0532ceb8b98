package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for a training-data pipeline, as pure Column
  * builders (whole-stage codegen, no UDFs). Each has an exact DuckDB
  * mirror in graft.Oracles so the differential gate covers them.
  *
  * Scale note: all are per-row map operations — no shuffle, fully
  * parallel over the scan, safe at 100 TB by construction.
  */
object TextFunctions {

  /** Whitespace tokenization (the "whitespace + BPE-ish regex" baseline). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Characters excluding whitespace — the numerator of avg word length. */
  def charCount(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", ""))

  def avgWordLen(c: Column): Column =
    charCount(c).cast(DoubleType) / tokenCount(c).cast(DoubleType)

  /** Type-token ratio: distinct tokens / tokens (near-1 ⇒ low redundancy). */
  def distinctTokenRatio(c: Column): Column =
    size(array_distinct(tokens(c))).cast(DoubleType) /
      tokenCount(c).cast(DoubleType)

  /** Language marker lexicons for the n-gram-free language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "y", "que", "es"))

  /** Tokens of `c` that appear in `set` (stopword / marker counting). */
  def tokensInSet(c: Column, set: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(set: _*)))

  /** Heuristic language ID: count marker hits per language, take argmax
    * with fixed priority en > de > fr > es; no hits ⇒ 'unknown'. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> tokensInSet(c, markers)
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Stopword ratio against the English marker lexicon. */
  def stopwordRatio(c: Column): Column =
    tokensInSet(c, LangMarkers.head._2).cast(DoubleType) /
      tokenCount(c).cast(DoubleType)

  /** Composite quality score ∈ [0,1]: length saturation + lexical
    * diversity + stopword plausibility band (the quality-scoring trio the
    * reference's data_quality_score plays for claims, re-cast for text). */
  def textQuality(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast(DoubleType) / 100.0, lit(1.0))
    val diversity = distinctTokenRatio(c)
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    // unrounded: see graft.functions.Exact.pct for the cross-engine
    // double-rounding hazard
    lenScore * 0.4 + diversity * 0.3 + stopScore * 0.3
  }

  /** Canonical text form for exact dedup: lower + collapse whitespace. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-dedup key (md5 matches DuckDB's md5 bit-for-bit). */
  def contentHash(c: Column): Column = md5(normalized(c))

  /** Word n-gram shingles as distinct strings — the input to both
    * n-gram-Jaccard similarity and MinHash. */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    array_distinct(transform(
      sequence(lit(0), greatest(size(t) - n, lit(0))),
      i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)
}
