package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for a training-data pipeline:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. Everything is built from codegen'd column
  * functions (no UDFs), so a 100 TB scoring pass stays inside
  * whole-stage codegen with the scan.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-unit count: runs of letters, runs of digits, and
    * single non-alphanumeric glyphs each count as one token — the
    * usual cheap proxy for LLM token budgets.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9 ]"))

  /** Mean characters per whitespace token. */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(stopwords: _*))).cast("double") /
      tokenCount(text)

  /** Type-token ratio — vocabulary diversity. */
  def distinctRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: stopword presence (natural
    * language uses function words), length (capped), and vocabulary
    * diversity — the length/punct/stopword-ratio family of heuristic
    * quality filters used for pre-training corpora.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val q = lit(0.4) * least(stopwordRatio(text, stopwords) * 8, lit(1.0)) +
      lit(0.3) * least(tokenCount(text).cast("double") / 100, lit(1.0)) +
      lit(0.3) * distinctRatio(text)
    // floor-based rounding: Spark's round() rounds the decimal
    // rendering while DuckDB rounds the binary double — they disagree
    // on exact .5 boundaries. floor(v*1e4 + 0.5) is pure IEEE
    // arithmetic, so both engines agree bitwise.
    floor(q * 10000 + 0.5) / 10000
  }

  /** Polynomial rolling hash of the character stream (Karp–Rabin
    * shape): fp = fold(7, c => fp*31 + ascii(c) mod 1e9+7). The DuckDB
    * oracle replays the equivalent SQL fold; Spark-side it is the
    * [[graft.functions.PolyFingerprint]] kernel — the lambda-fold form
    * paid a boxed dispatch and a substring per character.
    */
  def fingerprint(text: Column): Column =
    TextKernels.poly_fingerprint(text)

  // ---- language identification ----------------------------------------

  /** Function-word profiles for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: langId is a coarse router, not a
    * classifier — the standard trick (langid.py-style) shrunk to the
    * five corpus languages.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "de", "que", "es", "una", "en", "por", "como"))

  /** Predicted language: NULL text → NULL (SQL convention); CJK
    * codepoints → zh; otherwise the profile with the highest
    * function-word hit count; no hits → 'und'. Deterministic argmax:
    * ties break toward the greater language code. One-pass
    * [[LangIdHeuristic]] kernel — the composable twin below pays a
    * lambda dispatch per token per profile and is kept for the
    * equivalence spec.
    */
  def langId(text: Column): Column = TextKernels.lang_id(text)

  /** The composable-column spelling of [[langId]] (equivalence-tested
    * against the kernel; not on any hot path).
    */
  private[graft] def langIdComposable(text: Column): Column = {
    val ws = transform(tokens(text), w => lower(w))
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      struct(
        size(filter(ws, w => w.isin(prof: _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    // the trailing otherwise would turn NULL text into 'und'; the
    // kernel (a null-intolerant UnaryExpression) propagates NULL
    when(text.isNull, lit(null).cast("string"))
      .when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }
}
