package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis columns for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristics. All pure Column
  * expressions (codegen'd, no UDFs), deterministic, and mirrored 1:1 by the
  * DuckDB oracle SQL in SparkEntry.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. One-pass codegen'd kernel:
    * identical output to `filter(split(trim(c), "\\s+"), length > 0)` (the
    * DuckDB oracle's formulation), which ran the split codegen'd but paid
    * an interpreted per-token filter lambda across the whole corpus.
    */
  def words(c: Column): Column = GraftExpressions.whitespaceTokens(c)

  def tokenCount(c: Column): Column = size(words(c))

  // Java-regex `\s` includes vertical tab \x0B; RE2's (the DuckDB
  // oracle's) does not — spell the RE2 set out so both engines class
  // \x0B as punctuation (the same divergence GraftExpressions.isAsciiWs
  // already fixed for tokenization)
  private val asciiWs = " \\t\\n\\f\\r"

  /** BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
    * (The classic GPT-2 pre-tokenizer regex family, ASCII simplification.)
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(s"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9$asciiWs]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  def charCount(c: Column): Column = length(c)

  /** Count of non-alphanumeric, non-whitespace characters. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, s"[^a-zA-Z0-9$asciiWs]", ""))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(c: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordCountFromWords(words(c), stopwords)

  /** [[stopwordCount]] over an already-BOUND token array column. Callers
    * that consume several word-derived stats in one projection must bind
    * `words(text)` to a column first (r19, guide §1.2): each inline
    * `words(...)` reference is a separate whitespace-tokenizer pass over
    * the document in the generated code — qualityScoreBp paid it twice,
    * langId five times.
    */
  def stopwordCountFromWords(ws: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(ws, w => w.isin(stopwords.map(x => x: Any): _*)))

  /** Heuristic quality score in basis points [0, 10000]:
    * 0.4·stopword-ratio + 0.3·min(1, tokens/100) + 0.3·(1 − punct-ratio).
    * Emitted as integer basis points so the result is bit-exact across
    * engines (double ops in fixed order, then floor).
    */
  def qualityScoreBp(c: Column): Column = qualityScoreBpFromWords(words(c), c)

  /** [[qualityScoreBp]] over an already-bound token array (see
    * [[stopwordCountFromWords]] — identical expression tree, one tokenizer
    * pass instead of two when `ws` is a bound column).
    */
  def qualityScoreBpFromWords(ws: Column, c: Column): Column = {
    val nTok = size(ws).cast(DoubleType)
    val nChar = charCount(c).cast(DoubleType)
    val stopRatio = when(nTok > 0, stopwordCountFromWords(ws).cast(DoubleType) / nTok)
      .otherwise(lit(0.0))
    val lengthScore = least(lit(1.0), nTok / lit(100.0))
    val punctRatio = when(nChar > 0, punctCount(c).cast(DoubleType) / nChar).otherwise(lit(0.0))
    val score = lit(0.4) * stopRatio + lit(0.3) * lengthScore + lit(0.3) * (lit(1.0) - punctRatio)
    floor(score * 10000).cast(LongType)
  }

  /** Language marker words (n-gram/stopword heuristic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "las", "es", "una"),
    "fr" -> Seq("le", "la", "les", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langMarkerCount(c: Column, markers: Seq[String]): Column =
    size(filter(words(c), w => w.isin(markers.map(x => x: Any): _*)))

  private def langMarkerCountFromWords(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(x => x: Any): _*)))

  /** Predicted language = argmax marker count, ties broken by the fixed
    * priority order of `langMarkers` (en first). A deterministic CASE chain
    * so the oracle mirrors it exactly.
    */
  def langId(c: Column): Column = langIdFromWords(words(c))

  /** [[langId]] over an already-bound token array (see
    * [[stopwordCountFromWords]] — one tokenizer pass instead of five, the
    * five marker filters then walk the bound array).
    */
  def langIdFromWords(ws: Column): Column =
    langIdFromCounts(langMarkers.map { case (lang, ms) =>
      lang -> langMarkerCountFromWords(ws, ms) })

  /** The langId argmax CASE chain over already-computed marker counts.
    * The chain references each count O(langs) times (every pairwise ≥
    * comparison), so callers on a hot path should bind the five counts to
    * COLUMNS first — inlined, the fold duplicated each size(filter(...))
    * walk up to ~8× (20 tokenizer+filter evaluations per row in the
    * pre-r19 q_lang_id plan).
    */
  def langIdFromCounts(counts: Seq[(String, Column)]): Column = {
    val chain = counts.zipWithIndex.foldRight(lit(counts.last._1): Column) {
      case (((lang, cnt), i), els) =>
        val rest = counts.drop(i + 1).map(_._2)
        if (rest.isEmpty) els
        else when(rest.foldLeft(lit(true): Column)((acc, o) => acc && cnt >= o), lit(lang)).otherwise(els)
    }
    chain
  }

  /** Whole-document fingerprint (hex MD5). The rolling-hash variant lives in
    * [[graft.functions.RollingHash]].
    */
  def fingerprintMd5(c: Column): Column = md5(c.cast(BinaryType))
}
