package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `poly_fingerprint(string) → long` — Karp–Rabin polynomial rolling
  * hash over the character stream: fp = fold(7, c => (fp*31 +
  * codepoint(c)) mod 1e9+7). Identical values to the composable SQL
  * fold `aggregate(sequence(1, length(t)), 7, (acc, i) => (acc*31 +
  * ascii(substring(t, i, 1))) % 1000000007)` — which the DuckDB oracle
  * replays — but in one primitive loop per row instead of a boxed
  * lambda dispatch plus a substring allocation per CHARACTER (measured
  * ~9× on the sf0.1 fingerprint scan). Codepoint iteration, not char:
  * `ascii`/`substring` are codepoint-based in both engines.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_fingerprint requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.polyFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.polyFingerprint($c)")

  override def prettyName: String = "poly_fingerprint"
  override protected def withNewChildInternal(c: Expression): PolyFingerprint =
    copy(child = c)
}

/** `lang_id(string) → string` — the [[TextAnalysis.langId]] heuristic
  * (CJK override, else function-word hit-count argmax with
  * language-code tie-break, no hits → 'und') in one token walk.
  * The composable form pays a lambda dispatch per token PER PROFILE
  * (4× `filter(tokens, isin(...))`) plus a regexp scan; this does one
  * pass with profile hash sets and an inline CJK range check.
  */
case class LangIdHeuristic(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

  override def prettyName: String = "lang_id"
  override protected def withNewChildInternal(c: Expression): LangIdHeuristic =
    copy(child = c)
}

/** `bigram_mode_count(string) → long` — the multiplicity of the most
  * frequent adjacent word bigram of a single-space-separated text
  * (texts with fewer than two tokens count their single whole-text
  * gram once). One token walk with a per-row hash map — the
  * repetition filter's hot kernel. The composable spelling
  * (`aggregate` over the sorted gram array) is NOT codegen-safe: a
  * primitive-typed fold accumulator makes Janino cast Object→long,
  * which drops the whole projection to interpreter mode; a static
  * primitive-returning kernel stays inside whole-stage codegen.
  */
case class BigramModeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_mode_count requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.bigramModeCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.bigramModeCount($c)")

  override def prettyName: String = "bigram_mode_count"
  override protected def withNewChildInternal(c: Expression): BigramModeCount =
    copy(child = c)
}

/** `word_bigrams(string) → array<string>` — adjacent space-separated
  * word pairs ("a b", "b c", …); fewer than two words → empty array
  * (so an explode drops the row, matching a `size(ws) >= 2` filter).
  * One primitive pass per row — the `transform(sequence(...),
  * element_at × 2 + concat)` spelling is an interpreted higher-order
  * function per GRAM (HOFs never enter codegen), which measured ~2 s
  * over sf0.1's bigram scan where this kernel runs in ~0.3 s. The
  * DuckDB oracle replays the list-comprehension form verbatim.
  */
case class WordBigrams(child: Expression)
  extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_bigrams requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordBigrams(input.asInstanceOf[UTF8String])

  override def prettyName: String = "word_bigrams"
  override protected def withNewChildInternal(c: Expression): WordBigrams =
    copy(child = c)
}

object TextKernels {

  // profile sets in ascending language-code order — the argmax scans
  // them in order and a LATER language wins ties, exactly like
  // array_max over (score, lang) structs in the composable form
  private val langProfiles: Array[(UTF8String, java.util.HashSet[String])] =
    TextAnalysis.LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      (UTF8String.fromString(lang), s)
    }.toArray

  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")

  /** The language-ID walk — static so generated code calls it directly. */
  def langId(s: UTF8String): UTF8String = {
    val str = s.toString
    // CJK override first (matches the regexp_count(...) > 0 branch)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) return zh
      i += Character.charCount(cp)
    }
    val scores = new Array[Int](langProfiles.length)
    var start = 0
    i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i >= start) { // empty tokens score in no profile — skip-free
          // Locale.ROOT: the composable form's lower() is
          // locale-insensitive; default-locale toLowerCase would
          // diverge on tr/az JVMs (dotless ı)
          val w = str.substring(start, i).toLowerCase(java.util.Locale.ROOT)
          var p = 0
          while (p < langProfiles.length) {
            if (langProfiles(p)._2.contains(w)) scores(p) += 1
            p += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    // argmax, later (greater lang code) profile wins ties
    var best = -1
    var bestScore = 0
    var p = 0
    while (p < langProfiles.length) {
      if (scores(p) >= bestScore && scores(p) > 0) {
        best = p; bestScore = scores(p)
      }
      p += 1
    }
    if (best < 0) und else langProfiles(best)._1
  }

  /** The fingerprint fold — static so generated code calls it directly
    * inside the whole-stage-codegen span.
    */
  def polyFingerprint(s: UTF8String): Long = {
    val str = s.toString
    var fp = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      fp = (fp * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    fp
  }

  /** The bigram-mode walk — static so generated code calls it directly.
    * Tokenization is `split(text, " ", -1)` (trailing empties kept),
    * matching Spark's `split` and DuckDB's `string_split` exactly;
    * bigram equality as a joined string equals pair equality because
    * tokens cannot contain the separator.
    */
  def bigramModeCount(s: UTF8String): Long = {
    val words = s.toString.split(" ", -1)
    if (words.length < 2) return 1L
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder(48)
    var best = 0
    var i = 0
    while (i < words.length - 1) {
      sb.setLength(0)
      sb.append(words(i)).append(' ').append(words(i + 1))
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  def wordBigrams(text: UTF8String): Any = {
    val words = text.toString.split(" ", -1)
    if (words.length < 2) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    } else {
      val out = new Array[Any](words.length - 1)
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < words.length - 1) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1))
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  def poly_fingerprint(text: Column): Column =
    GraftColumnBridge.column(
      PolyFingerprint(GraftColumnBridge.expression(text)))

  def lang_id(text: Column): Column =
    GraftColumnBridge.column(
      LangIdHeuristic(GraftColumnBridge.expression(text)))

  def bigram_mode_count(text: Column): Column =
    GraftColumnBridge.column(
      BigramModeCount(GraftColumnBridge.expression(text)))

  def word_bigrams(text: Column): Column =
    GraftColumnBridge.column(
      WordBigrams(GraftColumnBridge.expression(text)))
}
