package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (whole-stage codegen, no UDFs) so they run at scan
  * speed over 100 TB — these are per-row maps with zero shuffles.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword-ratio
    * language heuristic. Deliberately small: the operator shape (argmax
    * over per-language hit ratios) is what matters, not lexicon quality.
    */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "pas", "vous", "une", "pour"),
    "es" -> Seq("el", "la", "que", "de", "los", "es", "una", "por", "con", "para"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(array_intersect(toks, array(words.map(lit): _*)))

  /** (lang_guess, per-lang hit counts). Guess = argmax hits, ties broken
    * by language-code order; "und" (undetermined) when no list hits.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = StopwordsByLang.map { case (l, ws) =>
      struct(hitCount(toks, ws).as("hits"), lit(l).as("lang"))
    }
    // array_max on (hits, lang) structs: max hits, then max lang — to get
    // deterministic *first* lang on ties, compare on (hits, reversed rank)
    val best = array_max(array(StopwordsByLang.zipWithIndex.map { case ((l, ws), i) =>
      struct(hitCount(toks, ws).as("hits"),
        lit(StopwordsByLang.size - i).as("prio"), lit(l).as("lang"))
    }: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality features + a combined score in [0,1]:
    * length score (saturating), alpha ratio, stopword ratio band, mean
    * token length band — the usual cheap pretraining-quality heuristics.
    */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val len = length(text).cast("double")
    // native byte-walk count ≡ length(regexp_replace(text,
    // "[^A-Za-z0-9 ]", "")) — keeps the quality path regex-free
    val alpha = ascii_alnum_space_count(text).cast("double")
    val alphaRatio = when(len === 0, 0d).otherwise(alpha / len)
    val allStop = TextAnalysis.StopwordsByLang.flatMap(_._2).distinct
    val stopRatio = when(nTok === 0, 0d)
      .otherwise(size(array_intersect(toks, array(allStop.map(lit): _*))).cast("double") / nTok)
    // mean token length from the normalized text: (chars - separators) / n
    // — one expression, reproducible verbatim in the SQL oracle
    val meanTokLen = when(nTok === 0, 0d)
      .otherwise((length(norm_text(text)).cast("double") - (nTok - 1)) / nTok)
    val lenScore = least(nTok / 64.0, lit(1.0))
    val mtlScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    struct(
      nTok.cast("long").as("n_tokens"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(stopRatio, 4).as("stop_ratio"),
      round(meanTokLen, 4).as("mean_tok_len"),
      // floor-based deterministic 4-decimal round: identical on any engine
      // computing the same double (plain round(x,4) differs across engines
      // when the weighted sum lands on the decimal half-grid)
      (floor((lenScore * 0.4 + alphaRatio * 0.3 + mtlScore * 0.3) * 10000 + 0.5) / 10000.0)
        .as("quality"))
  }

  /** Whitespace token count + BPE-ish subword count via regex: runs of
    * letters, single digits, or single punctuation marks — a cheap proxy
    * for tokenizer cost accounting.
    */
  def tokenCounts(text: Column): Column = struct(
    size(tokens(text)).cast("long").as("ws_tokens"),
    // native walk ≡ size(regexp_extract_all(lower(text),
    // "[a-z]+|[0-9]|[^a-z0-9\s]", 0)): letter runs / digits /
    // other non-space code points — the last regex in a declared query
    // path (the JVM regex engine's first-use JIT was being charged to
    // whichever query hit it first in a bench session)
    bpe_count(text).cast("long").as("bpe_tokens"))

  /** Rolling polynomial fingerprint over normalized tokens:
    * acc = (acc * 131 + (ascii(first char) * 31 + len)) mod 1e9+7.
    * Cross-engine reproducible (same formula runs in the DuckDB oracle);
    * bounded < 2^63 so ANSI-safe.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      pmod(acc * 131L + (ascii(t).cast("long") * 31L + length(t)),
        lit(1000000007L)))
}
