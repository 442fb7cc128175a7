package graft

/** The kernels must be reachable from plain SQL, not only the Column
  * API — a spark.sql() user of the library sees the same functions.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("scalar kernels are SQL-registered with correct semantics") {
    val r = spark.sql(
      """SELECT
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  intersect_count_sorted(array(1L,2L,3L), array(2L,3L,9L)) AS ic,
        |  intersect_count_at_least(array(1L,2L,3L), array(2L,3L,9L), 3L) AS ica,
        |  poly_fingerprint('abc') AS fp,
        |  lang_id('the of and it is') AS lang,
        |  size(word_ngram_hashes('a b c d', 3)) AS n_grams,
        |  simhash64(array(1L, 2L, 3L)) AS sh,
        |  dot_product_i8(quantize_i8(array(1.0d, -2.0d)),
        |                 quantize_i8(array(1.0d, -2.0d))) AS qdot
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == -1L) // intersection 2 can't reach 3
    assert(r.getLong(3) == ((7L * 31 + 97) * 31 + 98) * 31 + 99)
    assert(r.getString(4) == "en")
    assert(r.getInt(5) == 2)
    r.getLong(6) // simhash evaluates without error; value spec'd elsewhere
    assert(r.getLong(7) == 64L * 64 + 127L * 127) // codes (64, -127)
  }

  test("topk_rows works from SQL with partial aggregation") {
    val rows = spark.sql(
      """SELECT g, topk_rows(ord, id, struct(id, ord), 2) AS top
        |FROM VALUES (1, 10.0d, 5L), (1, 10.0d, 2L), (1, 7.0d, 9L),
        |            (2, 1.0d, 1L)
        |  AS t(g, ord, id)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      == Seq(2L, 5L)) // ord ties -> smaller id first; 7.0 evicted
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      == Seq(1L))
  }

  test("hll_distinct and freq_topk remain SQL-reachable") {
    val r = spark.sql(
      """SELECT hll_distinct(x) AS ndv, freq_topk(y, 4) AS hh
        |FROM VALUES (1, 'a'), (2, 'a'), (3, 'b') AS t(x, y)""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 3L)
    val hh = r.getSeq[org.apache.spark.sql.Row](1)
    assert(hh.head.getString(0) == "a" && hh.head.getLong(1) == 2L)
  }

  test("text scoring functions are SQL-registered ≡ the Column forms") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextAnalysis
    graft.sources.Tables.load(spark, sf, "documents").limit(50)
      .createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, token_count(text) AS nt,
        |  distinct_ratio(text) AS dr, stopword_ratio(text) AS sw,
        |  quality_score(text) AS q
        |FROM sql_docs""".stripMargin).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val viaColumn = spark.table("sql_docs")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("nt"),
        TextAnalysis.distinctRatio(col("text")).as("dr"),
        TextAnalysis.stopwordRatio(col("text"),
          graft.operators.TextQueries.Stopwords).as("sw"),
        TextAnalysis.qualityScore(col("text"),
          graft.operators.TextQueries.Stopwords).as("q"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(viaSql == viaColumn && viaSql.nonEmpty)
  }

  test("operations surface: graft_summaries() and " +
      "graft_explain_routing() are SQL table functions with Scala-API " +
      "parity") {
    import org.apache.spark.sql.functions._
    import graft.plans.{RoutingExplain, Summaries}
    import graft.sources.Tables
    Summaries.create(Tables.load(spark, sf, "lineitem"), "sql_surf",
      grain = Seq("l_returnflag", "l_linestatus"),
      sums = Seq("sq" -> "cast(l_quantity as decimal(18,2))"))
    try {
      // catalog parity: one row per statusRows() entry, same fields
      val viaSql = spark.sql(
        "SELECT name, substrate, grain, gen, state, where_sql, " +
          "measures FROM graft_summaries() ORDER BY name").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getString(4), r.getString(5), r.getString(6)))
        .toSeq
      val viaApi = Summaries.statusRows().map(r =>
        (r.name, r.substrate, r.grain, r.gen, r.state, r.where,
          r.measures))
      assert(viaSql == viaApi && viaSql.exists(_._1 == "sql_surf"))
      // sizes are measured, not placeholders
      val sz = spark.sql("SELECT n_rows, n_bytes FROM graft_summaries()" +
        " WHERE name = 'sql_surf'").collect()(0)
      assert(sz.getLong(0) > 0 && sz.getLong(1) > 0)
      // explain parity: the TVF returns exactly the explainer's lines
      val probe = "SELECT l_returnflag, count(*) AS n FROM " +
        s"parquet.`$sf/lineitem.parquet` GROUP BY l_returnflag"
      val tvfLines = spark.sql(
        s"SELECT routing FROM graft_explain_routing(${"\"" + probe
          .replace("\"", "\\\"") + "\""})")
        .collect().map(_.getString(0)).toSeq
      val apiLines = RoutingExplain.explain(spark.sql(probe))
        .split("\n").toSeq
      assert(tvfLines == apiLines, s"$tvfLines\nvs\n$apiLines")
      assert(tvfLines.exists(l =>
        l.contains("ROUTES") && l.contains("sql_surf")),
        tvfLines.mkString("\n"))
      // a malformed inner query reports, not throws
      val bad = spark.sql(
        "SELECT routing FROM graft_explain_routing('SELEC nope')")
        .collect().map(_.getString(0)).mkString
      assert(bad.contains("explain failed"))
      // SHOW MATERIALIZED VIEWS: the operator's one-liner, same rows
      // and columns as the TVF
      val shown = spark.sql("SHOW MATERIALIZED VIEWS")
      assert(shown.columns.toSeq == Seq("name", "substrate", "grain",
        "gen", "state", "where_sql", "measures", "n_rows", "n_bytes",
        "cube_bytes", "cube"))
      val shownRows = shown.collect()
        .map(r => (r.getString(0), r.getInt(3), r.getString(4))).toSeq
      assert(shownRows == Summaries.statusRows()
        .map(r => (r.name, r.gen, r.state)),
        shownRows.toString)
      assert(shownRows.exists(_._1 == "sql_surf"))
    } finally Summaries.drop("sql_surf")
  }

  test("MV lifecycle as SQL DDL: CREATE MATERIALIZED VIEW routes a " +
      "query, REFRESH folds an appended delta, DROP revokes — no " +
      "Scala API touched") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.plans.Summaries
    import scala.jdk.CollectionConverters._
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      allPlanNodes(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl").toFile
    val srcPath = new java.io.File(dir, "src").getAbsolutePath
    import spark.implicits._
    (0 until 4000).map(i => ("g" + (i % 6), i.toLong, i * 2L))
      .toDF("x", "v", "w").repartition(2).write.parquet(srcPath)
    val q = () => spark.read.parquet(srcPath)
      .groupBy("x").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("sv"),
        avg(col("w").cast("decimal(18,2)")).as("aw"),
        min(col("v")).as("mv"))
      .orderBy("x")
    try {
      val created = spark.sql("CREATE MATERIALIZED VIEW ddl_mv AS " +
        s"SELECT x, count(*) AS n, sum(cast(v AS decimal(18,2))) AS sv, " +
        "avg(cast(w AS decimal(18,2))) AS aw, min(v) AS mv, " +
        s"hll_distinct(v) AS hv FROM parquet.`$srcPath` GROUP BY x")
        .collect()
      assert(created.length == 1 &&
        created(0).getString(1).contains("created"), created.toSeq)
      assert(Summaries.isRegistered("ddl_mv"))
      // the DDL-created summary ROUTES, value-identical to raw
      val expected = {
        spark.conf.set(graft.plans.SummaryRewrite.ConfKey, "false")
        try q().collect().toSeq
        finally spark.conf.unset(graft.plans.SummaryRewrite.ConfKey)
      }
      val p = scanPaths(q())
      assert(p.nonEmpty && p.forall(_.contains("graft_summaries")),
        s"a DDL-created MV must route: $p")
      assert(q().collect().toSeq == expected)
      // REFRESH folds an appended file
      (0 until 600).map(i => ("g0", i.toLong, i * 3L))
        .toDF("x", "v", "w").coalesce(1)
        .write.mode("append").parquet(srcPath)
      Summaries.invalidate("ddl_mv")
      val refreshed = spark.sql("REFRESH MATERIALIZED VIEW ddl_mv")
        .collect()
      assert(refreshed(0).getString(1).contains("generation 1"),
        refreshed.toSeq)
      assert(q().collect().toSeq != expected) // the append is visible
      assert(scanPaths(q()).forall(_.contains("graft_summaries")))
      // a second REFRESH is a no-op
      assert(spark.sql("REFRESH MATERIALIZED VIEW ddl_mv")
        .collect()(0).getString(1).contains("fresh"))
      // DROP revokes; IF EXISTS tolerates the gone name
      assert(spark.sql("DROP MATERIALIZED VIEW ddl_mv")
        .collect()(0).getString(1) == "dropped")
      assert(!Summaries.isRegistered("ddl_mv"))
      assert(!scanPaths(q()).exists(_.contains("graft_summaries")))
      assert(spark.sql("DROP MATERIALIZED VIEW IF EXISTS ddl_mv")
        .collect()(0).getString(1).contains("ignored"))
      intercept[Exception] {
        spark.sql("DROP MATERIALIZED VIEW ddl_mv").collect()
      }
      // VACUUM sweeps orphan generations (SQL face of gcOrphans):
      // a hand-planted crash-debris dir goes, with the default grace
      // sparing anything fresh unless GRACE 0 is asked for
      val orphan = new java.io.File(
        "spark-warehouse/graft_summaries/ddl_mv__g9")
      orphan.mkdirs()
      spark.sql("VACUUM MATERIALIZED VIEWS").collect()
      assert(orphan.exists(),
        "the default 10-minute grace must spare a fresh dir")
      val swept = spark.sql(
        "VACUUM MATERIALIZED VIEWS GRACE 0 MINUTES").collect()
      assert(swept.exists(_.getString(1).endsWith("ddl_mv__g9")),
        swept.toSeq.toString)
      assert(!orphan.exists())
      // an unsupported defining query refuses with the contract named
      val e = intercept[IllegalArgumentException] {
        spark.sql("CREATE MATERIALIZED VIEW ddl_bad AS " +
          s"SELECT x, collect_list(v) AS l FROM parquet.`$srcPath` " +
          "GROUP BY x").collect()
      }
      assert(e.getMessage.contains("supported measures"), e.getMessage)
      // and everything that is NOT MV DDL still parses through Spark
      assert(spark.sql("SELECT 1 AS one").collect()(0).getInt(0) == 1)
    } finally {
      Summaries.drop("ddl_mv")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("CREATE MATERIALIZED VIEW over an ALIASED source (temp view) " +
      "with a WHERE and measures: the analyzer's qualified names are " +
      "stripped, the filtered MV registers and routes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.plans.Summaries
    import scala.jdk.CollectionConverters._
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      allPlanNodes(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl_tv")
      .toFile
    val srcPath = new java.io.File(dir, "src").getAbsolutePath
    import spark.implicits._
    (0 until 3000).map(i => ("s" + (i % 2), "g" + (i % 5), i.toLong))
      .toDF("slice", "x", "v").repartition(2).write.parquet(srcPath)
    spark.read.parquet(srcPath).createOrReplaceTempView("ddl_tv")
    try {
      // pre-fix this threw: the analyzed WHERE rendered as
      // (ddl_tv.slice = 's0') and the measure as ddl_tv.v — both
      // outside the bare-name declaration grammar
      val created = spark.sql("CREATE MATERIALIZED VIEW ddl_tvmv AS " +
        "SELECT slice, x, count(*) AS n, " +
        "sum(cast(v AS decimal(18,2))) AS sv " +
        "FROM ddl_tv WHERE slice = 's0' GROUP BY slice, x").collect()
      assert(created(0).getString(1).contains("created"),
        created.toSeq)
      val whereSql = spark.sql("SELECT where_sql FROM " +
        "graft_summaries() WHERE name = 'ddl_tvmv'")
        .collect()(0).getString(0)
      assert(whereSql.contains("slice") && !whereSql.contains("ddl_tv"),
        whereSql)
      // a slice-subsumed query routes, value-identical to raw
      val q = () => spark.read.parquet(srcPath)
        .filter(col("slice") === "s0")
        .groupBy("slice", "x").agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).as("sv"))
        .orderBy("x")
      val expected = {
        spark.conf.set(graft.plans.SummaryRewrite.ConfKey, "false")
        try q().collect().toSeq
        finally spark.conf.unset(graft.plans.SummaryRewrite.ConfKey)
      }
      val p = scanPaths(q())
      assert(p.nonEmpty && p.forall(_.contains("graft_summaries")),
        s"the temp-view-declared filtered MV must route: $p")
      assert(q().collect().toSeq == expected)
    } finally {
      Summaries.drop("ddl_tvmv")
      spark.catalog.dropTempView("ddl_tv")
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("graft_explain_routing never EXECUTES its argument: commands " +
      "are refused at parse, a nested self-call is refused, plain " +
      "queries still explain") {
    import graft.sources.Tables
    // a command smuggled into the explain surface must NOT run —
    // pre-fix, spark.sql() executed it eagerly during analysis
    spark.sql("DROP TABLE IF EXISTS graft_tvf_guard")
    graft.operators.Layout.dropOrphanLocation(spark, "graft_tvf_guard")
    spark.sql("CREATE TABLE graft_tvf_guard (k INT) USING parquet")
    try {
      val out = spark.sql("SELECT routing FROM graft_explain_routing(" +
        "'DROP TABLE graft_tvf_guard')")
        .collect().map(_.getString(0)).mkString
      assert(out.contains("refused") && out.contains("command"), out)
      assert(spark.catalog.tableExists("graft_tvf_guard"),
        "the DDL must not have executed as an explain side effect")
      val ins = spark.sql("SELECT routing FROM graft_explain_routing(" +
        "'INSERT INTO graft_tvf_guard VALUES (1)')")
        .collect().map(_.getString(0)).mkString
      assert(ins.contains("refused"), ins)
      assert(spark.table("graft_tvf_guard").count() == 0,
        "the DML must not have executed")
      val set = spark.sql("SELECT routing FROM graft_explain_routing(" +
        "'SET spark.graft.tvfguard=1')")
        .collect().map(_.getString(0)).mkString
      assert(set.contains("refused"), set)
      assert(spark.conf.getOption("spark.graft.tvfguard").isEmpty)
      // self-reference terminates instead of recursing unboundedly
      val nested = spark.sql("SELECT routing FROM graft_explain_routing(" +
        "\"SELECT * FROM graft_explain_routing('SELECT 1')\")")
        .collect().map(_.getString(0)).mkString
      assert(nested.contains("refused") && nested.contains("nested"),
        nested)
      // and an honest query still explains
      val ok = spark.sql("SELECT routing FROM graft_explain_routing(" +
        s"'SELECT count(*) AS n FROM parquet.`$sf/region.parquet`')")
        .collect().map(_.getString(0))
      assert(ok.nonEmpty && !ok.mkString.contains("refused"),
        ok.mkString("\n"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_tvf_guard")
  }
}
