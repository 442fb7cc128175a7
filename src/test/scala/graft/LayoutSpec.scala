package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave, independently written. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zorderKey equals the reference interleave on real keys") {
    val rows = Tables.load(spark, sf, "orders")
      .select(
        col("o_custkey").bitwiseAND(lit(65535L)).as("x"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .bitwiseAND(lit(65535L)).as("y"))
      .withColumn("z", Layout.zorderKey(col("x"), col("y")))
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"zorder mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorderKey is invertible (distinct inputs -> distinct keys)") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val keys = pts.map { case (x, y) => morton(x, y) }
    assert(keys.distinct.size == pts.size)
  }

  test("manifest buckets are tight boxes covering every row") {
    // bucketShift=18 on a 32-bit key fixes the top 7 bits of BOTH
    // dimensions, so a bucket's bounding box spans < 2^9 per dim —
    // the geometric fact that turns min/max stats into file pruning
    val m = Layout.zorderManifest(spark, sf).collect()
    assert(m.nonEmpty)
    val total = m.map(_.getLong(1)).sum
    assert(total == Tables.load(spark, sf, "orders").count())
    m.foreach { b =>
      assert(b.getLong(3) - b.getLong(2) <= 511L,
        s"custkey span too wide in bucket ${b.getLong(0)}")
      assert(b.getLong(5) - b.getLong(4) <= 511L,
        s"day span too wide in bucket ${b.getLong(0)}")
    }
    // bucket ids are distinct (one manifest row per bucket)
    val ids = m.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("z-ordered write: a 2-D query box prunes most files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder")
      .toString
    val orders = Tables.load(spark, sf, "orders").select(
      col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(65535L)).as("ck"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
        .bitwiseAND(lit(65535L)).as("day"))
    Layout.writeZOrdered(orders, "ck", "day", s"$tmp/z", nFiles = 8)
    val boxes = spark.read.parquet(s"$tmp/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("day").as("dmin"), max("day").as("dmax"),
        count(lit(1)).as("n"))
      .collect()
    assert(boxes.length >= 4, s"expected several files, got ${boxes.length}")
    assert(boxes.map(_.getLong(3)).sum == orders.count())
    // a day-window of 1/8 the global range must intersect a minority
    // of the per-file boxes — the pruning the layout exists for (a
    // row-order write spreads every day across every file)
    val days = orders.select(min("day"), max("day")).collect().head
    val (gmin, gmax) = (days.getLong(0), days.getLong(1))
    val lo = gmin + (gmax - gmin) * 7 / 16
    val hi = lo + (gmax - gmin) / 8
    val hit = boxes.count(b => b.getLong(1) <= hi && b.getLong(2) >= lo)
    assert(hit <= boxes.length / 2,
      s"query box hit $hit of ${boxes.length} files — layout not clustering")
  }

  test("bucketed tables join with zero exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket")
      .toString
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/b_orders").mode("overwrite")
        .saveAsTable("b_orders")
      Tables.load(spark, sf, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/b_cust").mode("overwrite")
        .saveAsTable("b_cust")
      val j = spark.table("b_orders").join(spark.table("b_cust"),
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      // co-bucketed layout: the join reads both sides pre-partitioned
      // on the key — no shuffle OR broadcast materializes (the write
      // amortized them), which is the bucketing contract at 100 TB
      assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"exchange crept in:\n$plan")
      assert(j.count() ==
        Tables.load(spark, sf, "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("q186: the co-located join is exchange-free below the " +
      "sort-merge join and equals the raw-parquet join") {
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.Layout.bucketedJoin(spark, sf)
      val rows = df.collect().toSeq
      // the join subtree must be exchange-free: both scans report the
      // same 8-bucket hash distribution, so only the aggregate and
      // the final sort shuffle
      val smj = allPlanNodes(df.queryExecution.executedPlan).collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty,
        s"expected a sort-merge join:\n${df.queryExecution.executedPlan}")
      val below = allPlanNodes(smj.get)
      assert(!below.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec]),
        s"shuffle below the co-located join:\n${smj.get}")
      // layout is invisible in the answer
      val raw = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          round(expr(
            "cast(sum(cast(l_quantity as decimal(18,2))) as double)"), 4)
            .as("sum_qty"),
          round(min(col("l_extendedprice")), 4).as("min_price"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(rows == raw)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("zorder_key is SQL-registered (same plan as the Column form)") {
    Tables.load(spark, sf, "orders").limit(100)
      .createOrReplaceTempView("layout_orders")
    val viaSql = spark.sql(
      """SELECT o_orderkey,
        |  zorder_key(o_custkey & 65535,
        |    CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)
        |      & 65535) AS z
        |FROM layout_orders""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaColumn = spark.table("layout_orders")
      .select(col("o_orderkey"), Layout.zorderKey(
        col("o_custkey").bitwiseAND(lit(65535L)),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .bitwiseAND(lit(65535L))).as("z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaColumn && viaSql.nonEmpty)
  }

  test("partitioned write: equality predicate prunes to PartitionFilters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part")
      .toString
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars")
    Layout.writePartitioned(docs, "lang", s"$tmp/by_lang")
    val back = spark.read.parquet(s"$tmp/by_lang")
      .filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    // directory-level pruning: the predicate must land in
    // PartitionFilters (metadata-only), not PushedFilters (data IO)
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang predicate not a partition filter:\n$plan")
    // layout on disk: one lang=<v> directory per value, and the en
    // directory alone holds exactly the filtered rows
    val dirs = new java.io.File(s"$tmp/by_lang").listFiles()
      .map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.length >= 3, s"expected per-lang dirs, got ${dirs.toSeq}")
    val expected = docs.filter(col("lang") === "en").count()
    assert(spark.read.parquet(s"$tmp/by_lang/lang=en").count() == expected)
    assert(back.count() == expected && expected > 0)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact0 = Tables.load(spark, sf, "orders")
      .withColumn("bucket", pmod(col("o_custkey"), lit(8L)))
    Layout.writePartitioned(fact0, "bucket", s"$tmp/fact")
    val fact = spark.read.parquet(s"$tmp/fact")
    // the dim filter is on a NON-partition column, so only runtime
    // pruning (subquery on the broadcast result) can skip fact dirs
    val dim = Tables.load(spark, sf, "customer")
      .withColumn("bucket", pmod(col("c_custkey"), lit(8L)))
      .filter(col("c_custkey") <= 2)
    val joined = fact.join(broadcast(dim), Seq("bucket"))
      .select(col("o_orderkey"), col("c_custkey"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$planStr")
    val rows = joined.collect()
    // correctness: identical to the unpartitioned join
    val expected = fact0.join(dim.select("bucket", "c_custkey"), Seq("bucket"))
      .count()
    assert(rows.length.toLong == expected && expected > 0)
    // runtime effect: the fact scan visited only the dim's ≤3 buckets,
    // not all 8 partition directories
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p.flatMap {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case other => Seq(other)
    }
    val factScan = allNodes(joined.queryExecution.executedPlan)
      .collectFirst {
        case s: FileSourceScanExec if s.metrics.contains("numPartitions") &&
          s.relation.location.rootPaths.exists(_.toString.contains("fact")) => s
      }
    assert(factScan.nonEmpty, "fact FileSourceScanExec not found")
    val visited = factScan.get.metrics("numPartitions").value
    val dimBuckets = dim.select("bucket").distinct().count()
    assert(visited == dimBuckets && visited < 8,
      s"DPP should visit $dimBuckets of 8 partitions, visited $visited")
  }

  test("compact: a shattered directory rewrites to the size-targeted file count") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    // the small-files shape: one table scattered across 40 tiny files
    Tables.load(spark, sf, "lineitem")
      .repartition(40).write.parquet(inDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(inDir)
    val bytes = p.getFileSystem(conf).listStatus(p)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getLen).sum
    val target = bytes / 3 // aim for ~3 output files
    val (before, after, measured) =
      Layout.compact(spark, inDir, outDir, targetFileBytes = target)
    assert(before == 40 && measured == bytes)
    val want = ((bytes + target - 1) / target).toInt
    assert(after == want, s"expected $want files, got $after")
    assert(after <= 4, s"compaction left $after files")
    // lossless: same row multiset either side
    val a = spark.read.parquet(inDir).collect()
      .map(_.toSeq.toString).sorted.toSeq
    val b = spark.read.parquet(outDir).collect()
      .map(_.toSeq.toString).sorted.toSeq
    assert(a == b)
  }

  test("compact: a PARTITIONED directory measures its subdirectory bytes") {
    // data files live under key=value subdirectories — the recursive
    // listing must see them (a flat listing measures 0 bytes and
    // collapses everything into one file)
    val base = java.nio.file.Files
      .createTempDirectory("graft-compact-part").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    Tables.load(spark, sf, "lineitem")
      .repartition(8)
      .write.partitionBy("l_returnflag").parquet(inDir)
    // a killed write's orphan under _temporary must NOT count: Spark
    // readers ignore hidden trees, so neither may the measurement
    val orphanDir = new java.io.File(s"$inDir/_temporary/0")
    orphanDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$inDir/_temporary/0/part-orphan.parquet"),
      Array.fill[Byte](1 << 20)(7))
    val (before, after, measured) =
      Layout.compact(spark, inDir, outDir,
        targetFileBytes = 64L * 1024 * 1024)
    assert(measured > 0L, "partitioned input measured 0 bytes")
    assert(before > 0, "no data files found under the partition dirs")
    assert(after >= 1)
    val cleanBytes = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(inDir)
      val fs = p.getFileSystem(conf)
      def walk(d: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(d).map { s =>
          val nm = s.getPath.getName
          if (nm.startsWith("_") || nm.startsWith(".")) 0L
          else if (s.isDirectory) walk(s.getPath) else s.getLen
        }.sum
      walk(p)
    }
    assert(measured == cleanBytes,
      s"orphaned _temporary bytes leaked into the measurement")
    // lossless AND layout-preserving: the compacted tree keeps its
    // key=value directories, so directory pruning still works
    assert(spark.read.parquet(outDir).count() ===
      Tables.load(spark, sf, "lineitem").count())
    val pruned = spark.read.parquet(outDir)
      .filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"compaction lost the partition layout:\n$plan")
  }

  test("bloom manifest: point lookup prunes to ~1 bucket, no false negatives") {
    val docs = Tables.load(spark, sf, "documents")
      .select(xxhash64(col("text")).as("key"),
        pmod(col("doc_id"), lit(16L)).as("file_bucket"))
      .persist()
    val manifest = Layout.bloomManifest(docs, "key", "file_bucket",
      numBits = 1 << 16, numHashes = 5).persist()
    try {
      val probes = docs.limit(20).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      probes.foreach { case (key, trueBucket) =>
        val hit = Layout.pruneBuckets(manifest, key)
        assert(hit.exists(_._1 == trueBucket),
          s"false negative: bucket $trueBucket for key $key")
        assert(hit.length <= 4,
          s"pruning too weak: ${hit.length} of 16 buckets survive")
      }
      // a key that exists nowhere prunes (nearly) everything
      val ghost = Layout.pruneBuckets(manifest, -987654321L)
      assert(ghost.length <= 2, s"ghost key hit ${ghost.length} buckets")
    } finally { docs.unpersist(); manifest.unpersist() }
  }

  test("q194: the sort-clustered lineitem copy answers the range " +
      "slice exactly like raw, with the scan EMITTING a fraction of " +
      "the table (row-group skipping); the fixture is " +
      "fingerprint-idempotent") {
    val df = Layout.sortedRangeScan(spark, sf)
    val rows = df.collect().toSeq
    val raw = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 3000L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(expr(
          "cast(sum(cast(l_quantity as decimal(18,2))) as double)"), 4)
          .as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(rows == raw && rows.nonEmpty)
    // skip evidence: the clustered scan emits well under the table
    val total = Tables.load(spark, sf, "lineitem").count()
    val emitted = allPlanNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numOutputRows").value
    }.sum
    assert(emitted > 0 && emitted * 10 < total * 6,
      s"row-group skipping must bound the read: $emitted of $total")
    // idempotent: a second ensure reuses the fingerprinted copy
    val p1 = Layout.ensureSortedLineitem(spark, sf)
    val m1 = new java.io.File(p1).lastModified()
    assert(Layout.ensureSortedLineitem(spark, sf) == p1)
    assert(new java.io.File(p1).lastModified() == m1,
      "an unchanged source must not rebuild the copy")
  }

  test("q195: the z-order-clustered lineitem copy answers the 2-D " +
      "box exactly like raw, with the scan EMITTING a fraction of " +
      "the table (both columns' stats tight under the interleave)") {
    val df = Layout.zorderRangeScan(spark, sf)
    val rows = df.collect().toSeq
    val raw = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 3000L &&
        col("l_partkey") >= 100L && col("l_partkey") < 500L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(expr(
          "cast(sum(cast(l_quantity as decimal(18,2))) as double)"), 4)
          .as("sum_qty"))
      .orderBy("l_returnflag").collect().toSeq
    assert(rows == raw && rows.nonEmpty)
    val total = Tables.load(spark, sf, "lineitem").count()
    val emitted = allPlanNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numOutputRows").value
    }.sum
    assert(emitted > 0 && emitted * 10 < total * 6,
      s"2-D stats skipping must bound the read: $emitted of $total")
  }

  test("partitionByColumns REFUSES when partition-directory type " +
      "inference would change the column on read-back (answers-" +
      "unchanged contract), and accepts inference-stable columns") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part_infer").toFile
    val srcPath = new java.io.File(dir, "src").getAbsolutePath
    val outPath = new java.io.File(dir, "parted").getAbsolutePath
    import spark.implicits._
    // `code` is a STRING of zero-padded digits: as a directory name
    // Spark re-infers it INT and '00123' reads back as 123 — data
    // loss the refusal exists to stop. `cat` is inference-stable.
    (0 until 400).map(i => ("%05d".format(i % 7), "c" + (i % 3), i.toLong))
      .toDF("code", "cat", "v").repartition(2).write.parquet(srcPath)
    try {
      val e = intercept[IllegalArgumentException] {
        Layout.partitionByColumns(spark, srcPath, outPath, Seq("code"))
      }
      assert(e.getMessage.contains("read-back") &&
        e.getMessage.contains("code"), e.getMessage)
      assert(!new java.io.File(outPath).exists(),
        "a refused copy must not stay on disk")
      // a stable column partitions fine and round-trips identically
      val acted = Layout.partitionByColumns(spark, srcPath, outPath,
        Seq("cat"))
      val back = spark.read.parquet(acted)
      assert(back.schema("cat").dataType ==
        org.apache.spark.sql.types.StringType)
      assert(back.agg(sum(col("v"))).collect()(0).getLong(0) ==
        spark.read.parquet(srcPath).agg(sum(col("v")))
          .collect()(0).getLong(0))
      // and sortByColumns REFUSES a Hive-partitioned tree: a flat
      // range-clustered copy would lose directory pruning and bake
      // inferred partition-column types into data
      val e2 = intercept[IllegalArgumentException] {
        Layout.sortByColumns(spark, acted,
          new java.io.File(dir, "sorted_bad").getAbsolutePath,
          Seq("v"))
      }
      assert(e2.getMessage.contains("Hive-partitioned"), e2.getMessage)
    } finally {
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
