package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types._

/** Hot-path array kernels as native Catalyst expressions.
  *
  * The composable forms (`zip_with` + `aggregate`, `transform` +
  * `xxhash64`) are semantically right but evaluate a lambda per
  * element with boxing — measured 8-20× slower on the bench's
  * million-pair joins. These expressions do one tight primitive loop
  * per row, keep identical IEEE evaluation order (left-to-right
  * accumulation), and therefore produce bit-identical results to both
  * the composable forms and the DuckDB oracle.
  */

/** `dot_product(array<double>, array<double>) → double` — Σ aᵢ·bᵢ in
  * element order. Implements doGenCode (a primitive Java loop), so it
  * participates in whole-stage codegen rather than breaking the span.
  * Matches the composable `zip_with`+`aggregate` null semantics:
  * unequal lengths or a null element yield NULL, never a silently
  * truncated or zero-padded sum.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** doGenCode for unary kernels whose logic lives in `nullSafeEval`:
  * embeds the expression instance as a codegen reference object and
  * calls it per row — one virtual call with the child evaluated by
  * generated code. The point is NOT the call itself but the span:
  * `CollapseCodegenStages` excludes any operator containing a
  * [[CodegenFallback]] expression from whole-stage codegen, so one
  * fallback kernel in a projection would demote every expression in
  * that stage to the interpreted path.
  */
trait UnaryKernelCodegen extends UnaryExpression {

  /** Public bridge so generated code can reach the kernel. */
  final def kernel(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    val cg = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val javaType = cg.javaType(dataType)
    nullSafeCodeGen(ctx, ev, c => {
      if (cg.isPrimitiveType(dataType)) {
        // Janino rejects a direct Object→primitive cast ("Cannot cast
        // Object to long"), which would silently drop the whole stage
        // to interpreter mode — cast to the box, then unbox. The
        // kernel's contract for primitive results is non-null output
        // for non-null input (nullSafeCodeGen already guards the
        // input), so no null flag to maintain.
        s"${ev.value} = ((${cg.boxedType(dataType)}) $ref.kernel($c))" +
          s".${javaType}Value();"
      } else {
        s"""
           |${ev.value} = ($javaType) $ref.kernel($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      }
    })
  }
}

/** `xxhash64_array(array<string>) → array<long>` — xxhash64(seed 42)
  * of each element; identical values to `transform(a, s ->
  * xxhash64(s))` without the per-element lambda dispatch.
  */
case class XxHash64Array(child: Expression)
  extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xxhash64_array requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      // null elements hash as the seed itself (a fixed sentinel) —
      // matches xxhash64()'s treatment of null input
      out(i) =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "xxhash64_array"
  override protected def withNewChildInternal(c: Expression): XxHash64Array =
    copy(child = c)
}

/** `minhash_signature(array<long>, k) → array<long>` — k minhashes in
  * one pass using Kirsch–Mitzenmacher double hashing: gᵢ(h) = h₁ +
  * i·h₂ with h₁ = h, h₂ = fmix64(h). One finalizer per element, k
  * wrapping adds — instead of k full array traversals.
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with UnaryKernelCodegen {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<long>, got ${other.sql}")
  }

  // splitmix64 finalizer (public-domain constant mixing)
  private def fmix64(v0: Long): Long = {
    var v = v0
    v ^= v >>> 30; v *= 0xBF58476D1CE4E5B9L
    v ^= v >>> 27; v *= 0x94D049BB133111EBL
    v ^ (v >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h1 = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      val h2 = fmix64(h1) | 1L
      var g = h1
      var j = 0
      while (j < k) {
        if (g < mins(j)) mins(j) = g
        g += h2 // wrapping: intentional mod-2^64 hash family
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** `intersect_count_sorted(array<long>, array<long>) → long` — size of
  * the intersection of two ASCENDING-SORTED distinct arrays by a
  * single merge walk: O(|a|+|b|), no per-pair hash set. The caller
  * sorts each row's array once (array_sort); the pair join then pays
  * only the walk — this is what turns a multi-million-pair Jaccard
  * verification from minutes into seconds.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted requires array<long>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < nx && j < ny) {
      // null slots (possible only from foreign inputs; our kernels
      // emit containsNull=false) are skipped, not counted
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { cnt += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $a.getLong($i);
         |    long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $cnt++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override def prettyName: String = "intersect_count_sorted"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

/** `intersect_count_at_least(a, b, required) → long` — the
  * [[IntersectCountSorted]] merge walk with an admissibility bound:
  * returns the exact intersection size when it is ≥ `required`, and -1
  * as soon as `count so far + min(remaining a, remaining b)` proves the
  * walk can't get there. Thresholded set-similarity joins call this
  * with the minimum intersection the Jaccard threshold implies
  * (J ≥ t ⇔ |A∩B| ≥ t/(1+t)·(|A|+|B|)): the overwhelmingly-dissimilar
  * candidate mass exits after a fraction of the walk instead of paying
  * O(|A|+|B|) each — the exact-verification stage's dominant cost.
  */
case class IntersectCountAtLeast(first: Expression, second: Expression,
    third: Expression) extends org.apache.spark.sql.catalyst.expressions
    .TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, t) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_at_least requires (array<long>, array<long>, " +
          s"long), got ${l.sql}, ${r.sql}, ${t.sql}")
    }

  override def nullSafeEval(a: Any, b: Any, req: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val required = req.asInstanceOf[Long]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < nx && j < ny) {
      if (cnt + math.min(nx - i, ny - j) < required) return -1L
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (cnt >= required) cnt else -1L
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, req) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val rem = ctx.freshName("rem")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $rem = (long) java.lang.Math.min($nx - $i, $ny - $j);
         |  if ($cnt + $rem < $req) { $cnt = -1L; break; }
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($cnt >= $req) ? $cnt : -1L;
       """.stripMargin
    })

  override def prettyName: String = "intersect_count_at_least"
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IntersectCountAtLeast = copy(f, s, t)
}

/** `word_ngram_hashes(text, n) → array<long>` — distinct xxhash64
  * values of the word n-gram shingles of a single-space-separated
  * text, in one pass: split, build each gram, hash, dedupe. Produces
  * exactly the same hash values as
  * `xxhash64_array(array_distinct(wordShingles(text, n)))` (same
  * concatenation, same default seed), without materializing the gram
  * strings through per-element lambda dispatch — the shingle
  * pipelines' dominant cost (measured ~20× on the sf0.1 span scan).
  * Texts with fewer than n words hash the whole text (mirroring
  * wordShingles' short-doc guard).
  *
  * `distinct = false` keeps EVERY gram at its position (index i =
  * the gram starting at word i) — the positioned form span-level
  * dedup explodes; an explicit `seed` makes two runs two independent
  * 64-bit draws per gram (a 128-bit combined key).
  */
case class WordNGramHashes(child: Expression, n: Int, seed: Long = 42L,
    distinct: Boolean = true)
  extends UnaryExpression with UnaryKernelCodegen {

  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val words = text.split(" ", -1)
    val hashes =
      if (words.length < n) {
        Array(XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(text),
          StringType, seed))
      } else {
        val out = new Array[Long](words.length - n + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= words.length - n) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(words(i + k))
            k += 1
          }
          out(i) = XxHash64Function.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
            StringType, seed)
          i += 1
        }
        out
      }
    if (!distinct) return new GenericArrayData(hashes)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    hashes.foreach(seen.add(_))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_ngram_hashes"
  override protected def withNewChildInternal(c: Expression): WordNGramHashes =
    copy(child = c)
}

/** `word_ngram_phashes(text, n, wide)` — distinct PORTABLE polynomial
  * hashes of the word n-gram shingles: the 31-base codepoint fold
  * `h ← (h·31 + cp) mod 1e9+7` any SQL engine can replay (DuckDB:
  * `list_reduce` over `string_split(gram, '')` with the same lambda)
  * — the q132/KMV portable-hash discipline extended from integers to
  * strings, so MinHash/SimHash signatures built on these values are
  * oracle-replayable end to end. `wide = true` additionally folds a
  * 37-base second hash and returns `h31·2³⁰ + h37` — a 60-bit value
  * whose bit planes SimHash can vote on (30-bit hashes would leave
  * bits 30..63 constant). Same gram construction and short-doc guard
  * as [[WordNGramHashes]]; same single pass, no gram strings
  * materialized. Codepoint caveat: the fold walks UTF-16 units, equal
  * to codepoints for BMP text (the corpus is ASCII); a replaying
  * engine folding true codepoints would diverge only on astral-plane
  * characters.
  */
case class WordNGramPHashes(child: Expression, n: Int,
    wide: Boolean = false)
  extends UnaryExpression with UnaryKernelCodegen {

  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_phashes requires string, got ${other.sql}")
  }

  private val P = 1000000007L

  // fold base `b` over the chars of words(i..i+span-1) joined by ' '
  private def gramHash(words: Array[String], i: Int, span: Int,
      base: Long): Long = {
    var h = 0L
    var k = 0
    while (k < span) {
      if (k > 0) h = (h * base + ' '.toInt) % P
      val w = words(i + k)
      var c = 0
      while (c < w.length) {
        h = (h * base + w.charAt(c).toInt) % P
        c += 1
      }
      k += 1
    }
    h
  }

  private def hashAt(words: Array[String], i: Int, span: Int): Long = {
    val h31 = gramHash(words, i, span, 31L)
    if (!wide) h31
    else (h31 << 30) + gramHash(words, i, span, 37L)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val words = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (words.length < n) seen.add(hashAt(words, 0, words.length))
    else {
      var i = 0
      while (i <= words.length - n) {
        seen.add(hashAt(words, i, n))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_ngram_phashes"
  override protected def withNewChildInternal(c: Expression): WordNGramPHashes =
    copy(child = c)
}

/** `minhash_signature_portable(array<long>, k) → array<long>` — k
  * minhashes over the PORTABLE affine family `gᵢ(h) = ((2i+1)·h + (i·
  * 2654435761 mod p)) mod p`, p = 1e9+7 — every coefficient an SQL
  * literal, so a replaying engine rebuilds the signature with a cross
  * join on `range(0, k)` and a grouped min (the q132 discipline
  * applied to MinHash). Inputs are expected in [0, p) (the
  * [[WordNGramPHashes]] narrow form); values outside are reduced mod
  * p first so the family stays well-defined. Same single-pass shape
  * as [[MinHashSignature]].
  */
case class MinHashSignaturePortable(child: Expression, k: Int)
  extends UnaryExpression with UnaryKernelCodegen {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature_portable requires array<long>, got ${other.sql}")
  }

  private val P = 1000000007L
  private val bs = Array.tabulate(k)(i => (i.toLong * 2654435761L) % P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = ((arr.getLong(i) % P) + P) % P
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1L) * h + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def prettyName: String = "minhash_signature_portable"
  override protected def withNewChildInternal(c: Expression)
      : MinHashSignaturePortable = copy(child = c)
}

/** `quantize_i8(array<double>) → array<tinyint>` — symmetric int8
  * quantization: qᵢ = floor(vᵢ·127/max|v| + 0.5) (half-up on both
  * engines — NOT banker's/half-away round(), which disagree on .5).
  * An all-zero vector quantizes to zeros. 4–8× smaller than
  * float32/64 on disk and across shuffles — the storage format a
  * 100 TB embedding corpus actually ships — and because cosine is
  * scale-invariant, ranking by cosine over the int8 codes needs no
  * dequantization and no stored scale ([[DotProductI8]]).
  */
case class QuantizeI8(child: Expression)
  extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  // null even for a non-null vector: non-finite or null ELEMENTS
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 requires array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      // non-finite elements quantize to nothing meaningful — NULL out
      // rather than silently emitting a plausible-looking code
      if (!java.lang.Double.isFinite(x)) return null
      val a = math.abs(x)
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx > 0) {
      i = 0
      while (i < n) {
        // (x * 127) / mx, NOT x * (127/mx): the oracle evaluates the
        // former, and the two IEEE association orders differ by ulps —
        // enough to flip a code at a k+0.5 floor boundary
        out(i) = math.floor(v.getDouble(i) * 127.0 / mx + 0.5).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "quantize_i8"
  override protected def withNewChildInternal(c: Expression): QuantizeI8 =
    copy(child = c)
}

/** `dot_product_i8(array<tinyint>, array<tinyint>) → long` — integer
  * dot product of two int8 codes. Exact integer arithmetic, so any
  * engine computes the identical value (and a double holds it exactly
  * up to 2^53 — dim·127² ≈ 10⁶ here): the quantized-cosine ranking is
  * bit-portable, unlike float dot products.
  */
case class DotProductI8(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product_i8 requires array<tinyint>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_product_i8"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}

/** `random_projection_band_keys(array<double>) → array<int>` — one
  * LSH band key per `bandBits` hyperplanes: bit j of band b is the
  * sign of v · planes(b·bandBits + j). One pass over all planes with
  * primitive loops; the plane matrix rides in the expression object
  * (one broadcast-serialized reference), NOT as plan literals — a
  * 128×64 literal matrix inflated plan/codegen time to ~10 s before
  * this kernel existed. A null vector or null element yields NULL
  * (same contract as dot_product).
  */
case class RandomProjectionBandKeys(child: Expression,
    planes: Seq[Seq[Double]], bandBits: Int)
  extends UnaryExpression with UnaryKernelCodegen {

  require(bandBits > 0 && bandBits <= 31, "bandBits must be in [1,31]")
  require(planes.nonEmpty && planes.size % bandBits == 0,
    "plane count must be a positive multiple of bandBits")

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // a non-null vector with a null ELEMENT also yields null, so this
  // must be nullable even when the child column isn't
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_projection_band_keys requires array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var d = 0
    while (d < n) { if (v.isNullAt(d)) return null; d += 1 }
    val vec = new Array[Double](n)
    d = 0
    while (d < n) { vec(d) = v.getDouble(d); d += 1 }
    val numBands = planeArr.length / bandBits
    val out = new Array[Int](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0
      var j = 0
      while (j < bandBits) {
        val p = planeArr(b * bandBits + j)
        val m = math.min(n, p.length)
        var acc = 0.0
        var i = 0
        while (i < m) { acc += vec(i) * p(i); i += 1 }
        if (acc >= 0) key |= 1 << j
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "random_projection_band_keys"
  override protected def withNewChildInternal(c: Expression)
      : RandomProjectionBandKeys = copy(child = c)
}

object VectorMath {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(e(a), e(b)))

  def xxhash64_array(a: Column): Column =
    GraftColumnBridge.column(XxHash64Array(e(a)))

  def minhash_signature(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignature(e(hashes), k))

  def intersect_count_sorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCountSorted(e(a), e(b)))

  def intersect_count_at_least(a: Column, b: Column,
      required: Column): Column =
    GraftColumnBridge.column(
      IntersectCountAtLeast(e(a), e(b), e(required)))

  def quantize_i8(v: Column): Column =
    GraftColumnBridge.column(QuantizeI8(e(v)))

  def dot_product_i8(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductI8(e(a), e(b)))

  def word_ngram_hashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordNGramHashes(e(text), n))

  /** Positioned (non-distinct) gram hashes under an explicit seed —
    * index i is the gram starting at word i.
    */
  def word_ngram_hashes_all(text: Column, n: Int, seed: Long): Column =
    GraftColumnBridge.column(
      WordNGramHashes(e(text), n, seed, distinct = false))

  def word_ngram_phashes(text: Column, n: Int,
      wide: Boolean = false): Column =
    GraftColumnBridge.column(WordNGramPHashes(e(text), n, wide))

  def minhash_signature_portable(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSignaturePortable(e(hashes), k))

  def random_projection_band_keys(vec: Column, planes: Seq[Seq[Double]],
      bandBits: Int): Column =
    GraftColumnBridge.column(
      RandomProjectionBandKeys(e(vec), planes, bandBits))
}
