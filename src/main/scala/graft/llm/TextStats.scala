package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Portable

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md
  * §2.4): tokenization, token counting, quality scoring, language ID,
  * document fingerprinting.
  *
  * Everything here is a codegen'd column expression over built-ins — no
  * UDFs, no shuffles except the final aggregations — so it runs at scan
  * speed on 100 TB.
  *
  * Hashing note: `portableHash` is built from `md5` so that the exact
  * same value is computable in other engines (the DuckDB oracle) — the
  * whole MinHash/SimHash pipeline is therefore differentially testable,
  * not just "rows > 0". Production could swap in `xxhash64` (cheaper)
  * without changing any semantics.
  */
object TextStats {

  /** Whitespace tokenization, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** 60-bit engine-portable word hash: first 15 hex digits of md5. */
  def portableHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  val HashMod = 2147483647L // 2^31 - 1 (prime); keeps a*h+b in BIGINT range

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count: words + extra tokens for long words
    * (every 4 chars beyond the first 4 ≈ one more subword merge).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + lit(1L) + (greatest(length(w) - 4, lit(0)) / 4).cast("long"))

  /** Stopword ratio: fraction of tokens in a small English stopword set. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, w => w.isin(stopwords.map(lit(_)): _*))).cast("double") /
        size(ws).cast("double"))
  }

  /** Mean token length in characters. */
  def meanWordLen(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / size(ws).cast("double"))
  }

  /** Heuristic document quality score in [0,1]: length band + stopword
    * presence + word-length sanity. Deterministic, engine-portable.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4
    val stopScore = least(stopwordRatio(text) * 10.0, lit(1.0)) * 0.3
    val mwl = meanWordLen(text)
    val wordScore = when(mwl >= 3.0 && mwl <= 8.0, 0.3).otherwise(0.1)
    Portable.round(lenScore + stopScore + wordScore, 4)
  }

  /** N-gram-heuristic language ID: score text against per-language marker
    * word sets; argmax with a fixed tie order. The marker sets are tiny
    * by design (the heuristic, not a model, is the declared operator).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "et", "est", "avec"),
    "es" -> Seq("el", "la", "y", "es", "con"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  def langScore(text: Column, lang: String): Column = {
    val ws = tokens(text)
    size(filter(ws, w => w.isin(langMarkers(lang).map(lit(_)): _*)))
  }

  /** Predicted language: highest marker count, ties broken by the fixed
    * order en > de > fr > es > zh; all-zero scores → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val order = Seq("en", "de", "fr", "es", "zh")
    val scores = order.map(l => langScore(text, l))
    val best = greatest(scores: _*)
    order.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Rolling-hash document fingerprint: polynomial fold over the portable
    * word hashes, mod 1e9+7. Order-sensitive (it is a sequence
    * fingerprint, not a bag fingerprint).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), w => portableHash(w) % 1000003L),
      lit(0L),
      (acc, h) => (acc * 31L + h) % 1000000007L)

  /** Quality-gate filter: the canonical pre-training cleaning pass —
    * keep documents in a token-count band, above a quality floor, and
    * (optionally) in an allowed predicted-language set. Pure pushed-down
    * scan predicates; composes with [[graft.llm.Dedup.dedupedCorpus]].
    */
  def qualityFilter(df: DataFrame, textCol: String,
                    minTokens: Int = 10, maxTokens: Int = 100000,
                    minQuality: Double = 0.5,
                    langs: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val base = df.where(tokenCount(t).between(minTokens, maxTokens) &&
      qualityScore(t) >= minQuality)
    if (langs.isEmpty) base else base.where(langId(t).isin(langs: _*))
  }

  /** Per-document stats frame: one row per doc with all declared metrics. */
  def documentStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      length(t).as("n_chars"),
      Portable.round(stopwordRatio(t), 4).as("stopword_ratio"),
      Portable.round(meanWordLen(t), 4).as("mean_word_len"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}
