package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.TextQueries

class TextAnalysisSpec extends SparkSpec {

  test("q126 naiveBayesLang replays a local NB computation exactly") {
    import graft.sources.Tables
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    val withToks = docs.filter(_._3.nonEmpty)
    val nDocs = docs.length
    val nd = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val nt = withToks.groupBy(_._2).view.mapValues(_.map(_._3.length).sum)
      .toMap
    val vocab = withToks.flatMap(_._3).distinct.length
    val wc = withToks.flatMap { case (_, l, ws) => ws.map(w => (l, w)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val langs = nd.keys.toSeq.sorted
    def score(ws: Seq[String], l: String): Double = r6(
      ws.map(w => math.log((wc.getOrElse((l, w), 0) + 1.0) /
        (nt(l) + vocab))).sum + math.log(nd(l).toDouble / nDocs))
    val expected = withToks.map { case (_, trueLang, ws) =>
      val pred = langs.minBy(l => (-score(ws, l), l))
      (trueLang, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, p), n) => (t, p, n) }.sortBy(t => (t._1, t._2))
    val got = TextQueries.naiveBayesLang(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(_._3).sum == withToks.length, "every doc classified once")
    assert(got == expected, s"NB diverged:\n$got\nvs\n$expected")
    // the model must learn more than the prior on the majority class
    val correct = got.collect { case (t, p, n) if t == p => n }.sum
    assert(correct > 0, "no correct classifications at all")
  }

  test("q128 countMinEstimates replays a local sketch; est ≥ exact always") {
    import graft.sources.Tables
    val P = 1000000007L
    val A = Seq(982451653L, 735632797L, 352654597L, 97L)
    val B = Seq(7L, 11L, 13L, 17L)
    val width = 64L
    def fp(w: String): Long =
      w.codePoints().toArray.foldLeft(7L)((acc, c) => (acc * 31 + c) % P)
    val toks = Tables.load(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .filter(_.nonEmpty)
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val sketch = scala.collection.mutable.Map.empty[(Int, Long), Long]
    exact.foreach { case (w, cnt) =>
      A.indices.foreach { i =>
        val b = ((A(i) * fp(w) + B(i)) % P) % width
        sketch((i, b)) = sketch.getOrElse((i, b), 0L) + cnt
      }
    }
    val probes = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
    val expected = probes.map { case (w, cnt) =>
      val est = A.indices.map(i =>
        sketch((i, ((A(i) * fp(w) + B(i)) % P) % width))).min
      (w, cnt, est)
    }.sortBy { case (w, c, _) => (-c, w) }
    val got = TextQueries.countMinEstimates(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"sketch diverged:\n$got\nvs\n$expected")
    assert(got.forall { case (_, ex, est) => est >= ex },
      "CM must never underestimate")
  }

  test("fingerprint kernel: property — matches a codepoint fold on random unicode") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Passed}
    // strings mixing ASCII, Latin-1, CJK, and astral (surrogate-pair)
    // codepoints — the kernel iterates by codepoint, not char
    val cpGen = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),
      2 -> Gen.choose(0xa0, 0xff),
      1 -> Gen.choose(0x4e00, 0x9fff),
      1 -> Gen.choose(0x10000, 0x10fff))
    val strGen = Gen.listOf(cpGen).map(cps =>
      cps.map(Character.toChars(_).mkString).mkString)
    val prop = Prop.forAll(strGen) { s =>
      val want = s.codePoints().toArray
        .foldLeft(7L)((acc, cp) => (acc * 31 + cp) % 1000000007L)
      graft.functions.TextKernels.polyFingerprint(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("token counting: whitespace vs regex subword units") {
    import spark.implicits._
    val df = Seq("hello world", "don't stop 123 now!").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.regexTokenCount(col("text"))).collect()
    assert(got(0).getInt(0) == 2 && got(0).getInt(1) == 2)
    // don ' t stop 123 now !  -> 7 subword units, 4 ws tokens
    assert(got(1).getInt(0) == 4 && got(1).getInt(1) == 7)
  }

  test("langId: real multilingual fixtures route correctly") {
    import spark.implicits._
    val fixtures = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("der hund ist nicht in das haus und die katze", "de"),
      ("le chat est dans la maison et les chiens", "fr"),
      ("el perro es una mascota que vive en la casa", "es"),
      ("你好世界这是中文", "zh"),
      ("xyzzy qwerty plugh", "und"))
    val got = fixtures.map(_._1).toDF("text")
      .select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    got.zip(fixtures.map(_._2)).foreach { case (pred, want) =>
      assert(pred == want, s"predicted $pred, wanted $want")
    }
  }

  test("fingerprint: deterministic, content-sensitive, order-sensitive") {
    import spark.implicits._
    val df = Seq("abc", "abc", "acb", "abcd").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2)) // order matters (rolling, not bag-of-chars)
    assert(fps(0) != fps(3))
    // closed form: ((7*31+97)*31+98)*31+99 for "abc"
    assert(fps(0) == ((7L * 31 + 97) * 31 + 98) * 31 + 99)
  }

  test("fingerprint of empty text is the fold seed (oracle parity)") {
    import spark.implicits._
    val fp = Seq("").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).collect()(0).getLong(0)
    assert(fp == 7L) // DuckDB list_reduce(list_prepend(7, [])) = 7
  }

  test("langId kernel ≡ the composable column form on edge cases") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat and it is happy", // en
      "der hund ist nicht in das haus und die katze", // de
      "le chat est dans la maison et les chiens", // fr
      "el perro es una mascota que vive en la casa", // es
      "你好世界这是中文", // zh (CJK override)
      "mixed 中文 and english the of", // CJK wins even with en words
      "xyzzy qwerty plugh", // und
      "", // empty text
      "THE OF AND", // case folding
      "la de el the", // cross-profile tie -> greater lang code
      "  double  spaces  the  ", // empty tokens from split
      null) // NULL text -> NULL out on both paths
    val got = texts.toDF("text").select(
      TextAnalysis.langId(col("text")).as("kernel"),
      TextAnalysis.langIdComposable(col("text")).as("composable")).collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel=${r.getString(0)} composable=${r.getString(1)} for '$t'")
    }
  }

  test("fingerprint kernel ≡ the composable SQL fold the oracle replays") {
    import spark.implicits._
    // mixed lengths, non-ASCII codepoints (é=233, €=8364, 中=20013),
    // plus a corpus-shaped long doc — kernel and lambda-fold must agree
    // everywhere since DuckDB replays the fold form
    val texts = Seq("", "a", "abc", "café €5", "中文 text",
      ("lorem ipsum dolor sit amet " * 20).trim)
    val df = texts.toDF("text")
    val foldForm = when(length(col("text")) === 0, lit(7L)).otherwise(
      aggregate(
        sequence(lit(1), length(col("text"))),
        lit(7L),
        (acc, i) =>
          (acc * 31 + ascii(substring(col("text"), i, lit(1)))) % 1000000007L))
    val rows = df.select(
      TextAnalysis.fingerprint(col("text")).as("kernel"),
      foldForm.as("fold")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"kernel != fold for '$t'")
    }
  }

  test("qualityScores stay in [0,1] and reward stopword-bearing docs") {
    val rows = TextQueries.qualityScores(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getDouble(3)
      assert(q >= 0.0 && q <= 1.0, s"quality out of range: $q")
    }
  }

  test("langIdQuery runs over the corpus (all rows classified)") {
    val df = TextQueries.langIdQuery(spark, sf)
    assert(df.filter(col("predicted_lang").isNull).count() == 0)
  }
}
