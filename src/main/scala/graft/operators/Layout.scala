package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Expression, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Data-layout clustering: Z-order (Morton) keys and the file-level
  * min/max manifest that makes them pay off. At 100 TB the scan cost
  * of a selective two-dimensional predicate is decided before the
  * query runs — by how the writer clustered the files. Sorting by a
  * bit-interleaved key gives every file a tight bounding box in BOTH
  * dimensions, so a reader holding the min/max manifest (parquet
  * row-group stats, table-format data-skipping indexes) prunes all
  * files outside the query box instead of scanning one well-clustered
  * dimension and the full range of the other.
  */
object Layout {

  /** Morton code over the low `bits` of two non-negative longs: bit i
    * of `x` lands at position 2i, bit i of `y` at 2i+1. Pure shift/and
    * arithmetic (no custom Expression, no UDF) — whole-stage-codegen'd
    * and replayable verbatim by any SQL engine. 16+16 bits keeps the
    * key in 32 bits; production layouts range-partition on this key at
    * write time. Built as a Catalyst tree (not the Column DSL) so the
    * SQL registration in GraftExtensions can emit it directly.
    */
  private[graft] def zorderExpr(x: Expression, y: Expression,
      bits: Int = 16): Expression = {
    val xl = Cast(x, LongType)
    val yl = Cast(y, LongType)
    def bit(v: Expression, i: Int, pos: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(v, Literal(i)), Literal(1L)),
        Literal(pos))
    (0 until bits).map { i =>
      Add(bit(xl, i, 2 * i), bit(yl, i, 2 * i + 1))
    }.reduce(Add(_, _))
  }

  def zorderKey(x: Column, y: Column, bits: Int = 16): Column =
    GraftColumnBridge.column(zorderExpr(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y),
      bits))

  /** The write side of the story: range-partition on the Morton key
    * and sort within partitions, so every output file covers a
    * contiguous zkey range — i.e. a tight bounding box in both
    * dimensions — and carries parquet min/max stats to match. This is
    * the OPTIMIZE ZORDER of table formats, spelled in two public
    * DataFrame calls; at 100 TB the range exchange samples boundaries
    * from the key distribution, so files come out size-balanced
    * whatever the data skew. The zkey column is kept in the output:
    * it is the clustering metadata a reader range-filters on.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int): Unit =
    df.withColumn("zkey", zorderKey(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)

  /** The data-skipping manifest a Z-ordered write of `orders` would
    * carry: cluster on zorder(custkey, order-day), split the key space
    * into fixed-width buckets (stand-ins for files — `bucketShift`=18
    * ⇒ up to 16384 buckets of a 32-bit key), and record each bucket's row
    * count and per-dimension min/max. Because a bucket is a contiguous
    * Morton range, its top bits fix the top bits of BOTH dimensions:
    * every bucket's bounding box spans < 2^9 in each — the geometric
    * fact [[LayoutSpec]] asserts and a query box turns into pruned
    * buckets. The aggregation is one scan + one NDV-sized shuffle;
    * nothing here is corpus-ordered.
    */
  /** Hive-style partitioned write — the coarse layout primitive that
    * precedes clustering: one directory per `partCol` value, so an
    * equality/IN predicate on it never opens a non-matching file (the
    * reader proves it from directory names alone — `PartitionFilters`
    * in the scan, zero data IO for pruned partitions). The 100 TB
    * rule of thumb: partition by the low-NDV routing column (date,
    * language, source), Z-order within partitions by the query
    * columns; too high an NDV shatters the table into small files,
    * which is why content-hash keys get [[bloomManifest]] instead.
    */
  def writePartitioned(df: DataFrame, partCol: String,
      path: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Size-targeted COMPACTION — the small-files cure: rewrite a
    * parquet directory into files of ~`targetFileBytes` each. A 100 TB
    * table accumulated from thousands of micro-batches degenerates
    * into millions of KB-scale files whose per-file open/footer/task
    * overhead dominates scans; compaction is the maintenance operation
    * every table format ships (OPTIMIZE / rewrite_data_files), spelled
    * here in public Spark API. The file count derives from MEASURED
    * on-disk bytes (input footer sizes — the compressed size the
    * output will roughly reproduce, since codec and schema carry
    * over), never a row-count guess; `repartition(n)` round-robins for
    * size-balanced output (the one case where a blind shuffle is the
    * point — balance, not co-location). Returns (filesBefore,
    * filesAfter, bytes).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int, Long) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(conf)
    val files = visibleDataFiles(fs, in)
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    // preserve a partitioned layout: compacting a key=value tree into
    // a flat directory would demote the partition column to data and
    // destroy directory pruning — real table maintenance rewrites
    // WITHIN partitions. Keys are read off the first data file's
    // subdirectory components (Spark guarantees a uniform tree).
    val partCols = partitionColsOf(in, files)
    val df = spark.read.parquet(inDir)
    if (partCols.isEmpty)
      df.repartition(n).write.mode("overwrite").parquet(outDir)
    else
      // hash-partition by the keys: each key's rows land in one task,
      // so each partition directory compacts to ~1 file (n caps the
      // concurrency, not the per-directory file count)
      df.repartition(math.max(n, 1), partCols.map(col): _*)
        .write.partitionBy(partCols: _*)
        .mode("overwrite").parquet(outDir)
    val outFiles = visibleDataFiles(fs, new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.startsWith("part-"))
    (files.length, outFiles, bytes)
  }

  /** MD5 over a directory's (path, len, mtime) listing — the
    * build-time fingerprint persisted artifacts (IVF index, sorted
    * copies) validate against, the same staleness discipline as the
    * MV router's source gate. Hidden components are excluded (the
    * same rule as [[visibleDataFiles]]).
    */
  private[graft] def dirFingerprint(spark: SparkSession,
      path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val files =
      visibleDataFiles(p.getFileSystem(
        spark.sparkContext.hadoopConfiguration), p)
    val md = java.security.MessageDigest.getInstance("MD5")
    files.map(st =>
        s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
      .sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** RECURSIVE data-file listing that sees key=value subdirectories
    * (a flat listing measures a partitioned table as 0 bytes) but
    * skips anything under a HIDDEN component (`_temporary`,
    * `.staging`, `_SUCCESS`…): Spark readers ignore those trees, so a
    * killed write's orphans must not inflate the measured bytes.
    */
  private def visibleDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.LocatedFileStatus] = {
    val rootPath = root.toUri.getPath
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val s = it.next()
      var p = s.getPath
      var hidden = false
      while (p != null && p.toUri.getPath != rootPath) {
        val nm = p.getName
        if (nm.startsWith("_") || nm.startsWith(".")) hidden = true
        p = p.getParent
      }
      if (!hidden) buf += s
    }
    buf.toArray
  }

  /** Partition column names of a written tree, in directory order —
    * the `key=value` components between `root` and the first data
    * file. Empty for a flat directory.
    */
  private def partitionColsOf(root: org.apache.hadoop.fs.Path,
      files: Array[org.apache.hadoop.fs.LocatedFileStatus])
      : Seq[String] = {
    val rootPath = root.toUri.getPath
    files.headOption.toSeq.flatMap { f =>
      var comps = List.empty[String]
      var p = f.getPath.getParent
      while (p != null && p.toUri.getPath != rootPath) {
        comps = p.getName :: comps
        p = p.getParent
      }
      comps.collect { case c if c.contains("=") => c.split("=")(0) }
    }
  }

  /** Bloom data-skipping manifest for point lookups on a high-NDV key
    * (the content-hash case partitioning can't serve): one mergeable
    * [[graft.functions.BloomAgg]] bitset per file bucket, built in a
    * single scan. A reader answers "which buckets might hold key K"
    * from the manifest alone — no false negatives by construction,
    * false positives bounded by the sketch's FPR — so a point lookup
    * reads ~1 bucket instead of the corpus. This is the file-level
    * bloom index of table formats, spelled as one group-by.
    */
  def bloomManifest(df: DataFrame, keyCol: String, bucketCol: String,
      numBits: Int = 1 << 17, numHashes: Int = 5): DataFrame = {
    import graft.functions.BloomFunctions.bloom_agg
    df.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        bloom_agg(col(keyCol), numBits, numHashes).as("key_filter"))
  }

  /** The read side of [[bloomManifest]]: the buckets whose filter
    * might contain `key`. Manifest pruning is a PLANNER step — table
    * formats evaluate data-skipping indexes on the driver against
    * files-sized metadata before any task launches — so this collects
    * the manifest (metadata-scale) once and probes each bucket's
    * deserialized bitset directly through
    * [[graft.functions.BloomKernel]] (the same math the scan-fused
    * probe compiles). Point-lookup loops should collect the manifest
    * once themselves and reuse [[probeBuckets]]. Returns
    * (bucket, n_rows) of survivors.
    */
  def pruneBuckets(manifest: DataFrame, key: Long): Seq[(Long, Long)] =
    probeBuckets(manifest.select("bucket", "n_rows", "key_filter")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2))),
      key)

  /** [[pruneBuckets]] over an already-collected manifest — each
    * bucket's bitset deserializes once per call, no expression
    * objects per bucket.
    */
  def probeBuckets(manifest: Seq[(Long, Long, Array[Byte])],
      key: Long): Seq[(Long, Long)] =
    manifest.filter { case (_, _, bytes) =>
      val (bits, numBits, numHashes) =
        graft.functions.BloomKernel.deserialize(bytes)
      graft.functions.BloomKernel.contains(bits, numBits, numHashes, key)
    }.map(t => (t._1, t._2))

  /** Bucketed CTAS — the co-location primitive partitioning can't
    * express: hash-distribute rows into a FIXED number of buckets on
    * the join/aggregation key at WRITE time (with an optional in-
    * bucket sort), registered as a catalog table so the reader's
    * planner knows the on-disk distribution. Two tables bucketed the
    * same way on their join keys sort-merge-join with ZERO shuffle
    * exchanges — at 100 TB the fact⋈fact join that otherwise moves
    * both tables across the network every query is paid ONCE, at
    * write time ([[LayoutSpec]]/q186 assert the exchange-free plan).
    * The 100 TB sizing rule: buckets ≈ table bytes / target partition
    * bytes, matched across the tables that join.
    */
  def createBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Managed-table name for a data dir's bucketed twin. Keyed on the
    * CANONICAL full path, not just the basename — two data dirs named
    * `sf0.1` under different parents are different tables, and a
    * basename-only key would silently reuse (or orphan-drop) a twin
    * built over the other one. The basename stays in the name for
    * readability; an 8-hex digest of the canonical path provides the
    * uniqueness.
    */
  private def bucketTableName(sfDir: String, base: String): String = {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    val tag = md.take(4).map("%02x".format(_)).mkString
    "graft_bkt_" + base + "_" +
      new java.io.File(sfDir).getName.replace('.', '_') + "_" + tag
  }

  /** CTAS a Hive-partitioned copy of a parquet table: `key=value`
    * directories on `cols`, so an equality/IN predicate on those
    * columns prunes whole directories at planning time instead of
    * filtering rows after a full scan (`PartitionFilters` in the
    * plan, `numFiles` strictly below the table's). The rows are
    * hash-distributed by the partition columns BEFORE the write —
    * the default layout would emit one file per (task × value),
    * a small-files explosion at any real parallelism; distributed,
    * each value's rows land in one task → ~one file per directory.
    * The lever the Advisor's `partition` nomination acts on; meant
    * for the low-NDV columns a workload repeatedly filters by (a
    * near-unique column would mint a directory per row — that is
    * what bucketing is for).
    */
  def partitionByColumns(spark: SparkSession, inDir: String,
      outDir: String, cols: Seq[String]): String = {
    require(cols.nonEmpty, "no partition columns")
    val df = spark.read.parquet(inDir)
    require(cols.forall(df.columns.contains),
      s"partition columns ${cols.mkString(", ")} must exist in $inDir")
    df.repartition(cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").partitionBy(cols: _*).parquet(outDir)
    // the answers-unchanged contract: partition values move into
    // directory NAMES, and Spark's partition-column type inference
    // re-derives their types on read — a string column of numeric-
    // looking values ('00123') comes back as INT with the zeros gone,
    // date-like strings come back as DATE. Probe with Spark's own
    // inference (a footer/directory read, no data scan) and REFUSE —
    // deleting the copy — when any partition column's read-back type
    // differs from the original, naming the cast-or-bucket way out.
    val back = spark.read.parquet(outDir).schema
      .map(f => f.name -> f.dataType).toMap
    val orig = df.schema.map(f => f.name -> f.dataType).toMap
    val drifted = cols.filter(c => back.get(c) != orig.get(c))
    if (drifted.nonEmpty) {
      val hp = new org.apache.hadoop.fs.Path(outDir)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
      throw new IllegalArgumentException(
        "partitionByColumns would change column types on read-back " +
          drifted.map(c => s"$c: ${orig(c).simpleString} -> " +
            s"${back.get(c).map(_.simpleString).getOrElse("?")}")
            .mkString("(", ", ", ")") +
          " — partition-directory names re-infer as the narrower " +
          "type and values like '00123' lose information; cast the " +
          "column to its inferred type first, or bucket instead " +
          "of partitioning")
    }
    outDir
  }

  /** Rewrite a parquet table RANGE-CLUSTERED on `cols`:
    * `repartitionByRange` gives a global order across output files
    * (file k holds a contiguous value interval) and
    * `sortWithinPartitions` orders rows inside each file, so every
    * file's — and every parquet row group's — min/max statistics
    * become tight disjoint intervals. A pushed range predicate
    * (`>=`, `BETWEEN`, date windows) then skips whole row groups at
    * read: the scan emits ≈ the rows the filter keeps instead of the
    * full table. The HIGH-NDV complement to [[partitionByColumns]]
    * (a directory per value would explode on the columns ranges run
    * over); columns stay real parquet columns, so there is no
    * partition-directory type-inference hazard. The 100 TB rule: the
    * range shuffle is paid ONCE at write; every later read of a
    * range slice is O(slice), not O(table). The lever the Advisor's
    * `sort-cluster` nomination acts on.
    */
  def sortByColumns(spark: SparkSession, inDir: String,
      outDir: String, cols: Seq[String], files: Int = 0): String = {
    require(cols.nonEmpty, "no sort columns")
    // a Hive-partitioned tree REFUSES: a flat range-clustered copy
    // would silently drop directory pruning on the partition columns
    // and bake their read-time inferred types into data (the same
    // hazard partitionByColumns probes for) — compact() preserves
    // the tree because it rewrites within partitions; this rewrite
    // reorders rows globally, which is only sound on a flat table
    val inP = new org.apache.hadoop.fs.Path(inDir)
    val inFs = inP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val treeCols = partitionColsOf(inP, visibleDataFiles(inFs, inP))
    require(treeCols.isEmpty,
      s"$inDir is Hive-partitioned on (${treeCols.mkString(", ")}) — " +
        "range-clustering would flatten the tree and lose " +
        "directory pruning; compact() within partitions, or sort " +
        "a flat copy of the slice you need")
    val df = spark.read.parquet(inDir)
    require(cols.forall(df.columns.contains),
      s"sort columns ${cols.mkString(", ")} must exist in $inDir")
    // the file count must stay EXPLICIT: an un-sized
    // repartitionByRange lets AQE coalesce a small table into ONE
    // file whose single row group spans every value — stats can skip
    // nothing and the rewrite buys nothing. Default: keep the
    // source's file count (clustering must not reduce read
    // parallelism) or the size-targeted count, whichever is larger.
    val n =
      if (files > 0) files
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        val in = new org.apache.hadoop.fs.Path(inDir)
        val bytes = visibleDataFiles(in.getFileSystem(conf), in)
          .map(_.getLen).sum
        val target = 128L * 1024 * 1024 // compact()'s file sizing
        math.max(math.max(1L, df.inputFiles.length.toLong),
          (bytes + target - 1) / target).toInt
      }
    df.repartitionByRange(n,
        cols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(
        cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  /** A previous JVM's managed-table directory with no catalog entry in
    * THIS JVM (the in-memory catalog dies with its session): Spark
    * refuses to CTAS over the orphaned location, so clear it first —
    * it is engine-owned scratch about to be rewritten.
    */
  private[graft] def dropOrphanLocation(spark: SparkSession,
      table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Idempotent per-SF bucketed twins of lineitem and orders, both
    * 8-bucketed on the order key (in-memory catalog: first use in a
    * JVM pays the CTAS, later uses hit the catalog).
    */
  private[graft] def ensureBucketedTables(spark: SparkSession,
      sfDir: String): (String, String) = {
    val liT = bucketTableName(sfDir, "li")
    val ordT = bucketTableName(sfDir, "ord")
    if (!spark.catalog.tableExists(liT)) {
      dropOrphanLocation(spark, liT)
      createBucketed(
        Tables.load(spark, sfDir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice",
            "l_returnflag"),
        liT, buckets = 8, key = "l_orderkey", sortCols = Seq("l_orderkey"))
    }
    if (!spark.catalog.tableExists(ordT)) {
      dropOrphanLocation(spark, ordT)
      createBucketed(
        Tables.load(spark, sfDir, "orders")
          .select("o_orderkey", "o_orderpriority"),
        ordT, buckets = 8, key = "o_orderkey", sortCols = Seq("o_orderkey"))
    }
    (liT, ordT)
  }

  /** q186: the co-located join those tables exist for — lineitem ⋈
    * orders on the bucket key, then a priority rollup. Both scans
    * report the SAME 8-bucket hash distribution, so the sort-merge
    * join runs with no exchange on either side (the only shuffles in
    * the plan are the aggregate's and the final sort's); the oracle
    * recomputes the identical join from the raw parquet in DuckDB —
    * bucketing is a LAYOUT choice, invisible in the answer.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (liT, ordT) = ensureBucketedTables(spark, sfDir)
    bucketedJoinQuery(spark, liT, ordT)
  }

  private[graft] def bucketedJoinQuery(spark: SparkSession,
      liT: String, ordT: String): DataFrame =
    spark.table(liT)
      .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_rows"),
        round(expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)"),
          4).as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"))
      .orderBy("o_orderpriority")

  /** Rewrite a parquet table Z-ORDER-CLUSTERED on exactly two numeric
    * columns: each is min/max-scaled to 16-bit rank space, the bits
    * interleave ([[zorderKey]]), and the table range-clusters on the
    * interleaved key. Every output file then covers a ~square CELL of
    * the 2-D value space, so BOTH columns' per-file (and per-row-
    * group) min/max statistics are tight — a pushed 2-D box predicate
    * skips everything outside ~the box's cells, where a lexicographic
    * sort serves only its leading column. The 2-D complement to
    * [[sortByColumns]]; same Hive-partitioned-tree refusal, same
    * explicit file sizing (skip granularity IS the cell grid — at
    * real scale the 128 MB default gives a fine grid for free; tests
    * pass `files` explicitly). The lever the Advisor's
    * `zorder-cluster` nomination acts on.
    */
  def zorderByColumns(spark: SparkSession, inDir: String,
      outDir: String, cols: Seq[String], files: Int = 0): String = {
    require(cols.length == 2,
      s"z-order interleaves exactly two columns, got $cols")
    val inP = new org.apache.hadoop.fs.Path(inDir)
    val inFs = inP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val treeCols = partitionColsOf(inP, visibleDataFiles(inFs, inP))
    require(treeCols.isEmpty,
      s"$inDir is Hive-partitioned on (${treeCols.mkString(", ")}) — " +
        "z-ordering would flatten the tree and lose directory pruning")
    val df = spark.read.parquet(inDir)
    require(cols.forall(df.columns.contains),
      s"z-order columns ${cols.mkString(", ")} must exist in $inDir")
    cols.foreach { c =>
      require(df.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column $c is ${df.schema(c).dataType.simpleString} " +
          "— interleaving needs numeric rank space (cast dates to " +
          "days first)")
    }
    val Seq(a, b) = cols
    val mm = df.agg(
      min(col(a)).cast("double"), max(col(a)).cast("double"),
      min(col(b)).cast("double"), max(col(b)).cast("double"))
      .collect()(0)
    def scaled(c: String, lo: Double, hi: Double) =
      if (mm.anyNull || hi <= lo) lit(0L)
      else ((col(c).cast("double") - lit(lo)) * lit(65535.0) /
        lit(hi - lo)).cast("long")
    val zk = zorderKey(
      scaled(a, mm.getDouble(0), mm.getDouble(1)),
      scaled(b, mm.getDouble(2), mm.getDouble(3)))
    val n =
      if (files > 0) files
      else math.max(math.max(1L, df.inputFiles.length.toLong),
        (visibleDataFiles(inFs, inP).map(_.getLen).sum +
          (128L * 1024 * 1024) - 1) / (128L * 1024 * 1024)).toInt
    df.withColumn("__graft_zk", zk)
      .repartitionByRange(n, col("__graft_zk"))
      .sortWithinPartitions("__graft_zk")
      .drop("__graft_zk")
      .write.mode("overwrite").parquet(outDir)
    outDir
  }

  private val sortedCopyLock = new Object

  /** Idempotent per-SF clustered copy of a table under
    * `spark-warehouse/graft_sorted/<prefix>_<sf>_<tag>/data`, built
    * by `build(src, out)`. Fingerprint-validated like the IVF index:
    * a changed source rebuilds; the marker is written LAST, so a
    * crashed build rebuilds instead of serving a partial copy.
    */
  private def ensureClusteredCopy(spark: SparkSession, sfDir: String,
      table: String, prefix: String,
      build: (String, String) => Unit): String =
    sortedCopyLock.synchronized {
      val canonical = new java.io.File(sfDir).getCanonicalPath
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(canonical.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      val root = new java.io.File(
        s"spark-warehouse/graft_sorted/${prefix}_" +
          new java.io.File(sfDir).getName.replace('.', '_') + "_" + tag)
        .getAbsoluteFile
      val dataPath = new java.io.File(root, "data").getAbsolutePath
      val marker = new java.io.File(root, "_graft_fp")
      val src = new java.io.File(sfDir, s"$table.parquet")
        .getAbsolutePath
      val srcFp = dirFingerprint(spark, src)
      val valid = marker.isFile && new String(java.nio.file.Files
        .readAllBytes(marker.toPath), "UTF-8").trim == srcFp
      if (!valid) {
        if (root.exists())
          java.nio.file.Files.walk(root.toPath).sorted(
            java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        root.mkdirs()
        build(src, dataPath)
        java.nio.file.Files.write(marker.toPath, srcFp.getBytes("UTF-8"))
      }
      dataPath
    }

  /** Idempotent per-SF RANGE-CLUSTERED copy of lineitem on
    * `l_orderkey` ([[sortByColumns]]) — q194's fixture, the
    * sort-cluster twin of q186's bucketed CTAS. 16 files at the test
    * SFs so row-group min/max stats have skip granularity (the
    * size-targeted default takes over at real scale, where files are
    * row-group-sized anyway).
    */
  def ensureSortedLineitem(spark: SparkSession, sfDir: String): String =
    ensureClusteredCopy(spark, sfDir, "lineitem", "li",
      (src, out) => sortByColumns(spark, src, out, Seq("l_orderkey"),
        files = 16))

  /** Idempotent per-SF Z-ORDER-CLUSTERED copy of lineitem on
    * (`l_orderkey`, `l_partkey`) ([[zorderByColumns]]) — q195's
    * fixture. 32 files = a 32-cell grid at the test SFs.
    */
  def ensureZorderedLineitem(spark: SparkSession,
      sfDir: String): String =
    ensureClusteredCopy(spark, sfDir, "lineitem", "liz",
      (src, out) => zorderByColumns(spark, src, out,
        Seq("l_orderkey", "l_partkey"), files = 32))

  /** q194: the range-slice report the sort-clustered copy exists
    * for — the scan EMITS ≈ the slice (row-group min/max skipping on
    * the clustered `l_orderkey`), not the table; the oracle
    * recomputes the identical report from raw lineitem in DuckDB —
    * sort clustering is a LAYOUT choice, invisible in the answer.
    */
  def sortedRangeScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dataPath = ensureSortedLineitem(spark, sfDir)
    spark.read.parquet(dataPath)
      .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 3000L)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        round(expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)"),
          4).as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"))
      .orderBy("l_returnflag")
  }

  /** q195: the 2-D box report the z-order-clustered copy exists for —
    * the scan EMITS ≈ the box's cells (both columns' per-file min/max
    * are tight under the interleave), not the table; the oracle
    * recomputes the identical report from raw lineitem in DuckDB —
    * z-ordering is a LAYOUT choice, invisible in the answer.
    */
  def zorderRangeScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dataPath = ensureZorderedLineitem(spark, sfDir)
    spark.read.parquet(dataPath)
      .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 3000L &&
        col("l_partkey") >= 100L && col("l_partkey") < 500L)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        round(expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)"),
          4).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  def zorderManifest(spark: SparkSession, sfDir: String,
      bucketShift: Int = 18): DataFrame = {
    val x = col("o_custkey").bitwiseAND(lit(65535L))
    val y = datediff(col("o_orderdate"), lit("1970-01-01"))
      .cast("long").bitwiseAND(lit(65535L))
    Tables.load(spark, sfDir, "orders")
      .select(x.as("ck"), y.as("day"),
        zorderKey(x, y).as("zkey"))
      .groupBy(shiftright(col("zkey"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ck")).as("min_ck"), max(col("ck")).as("max_ck"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("z_bucket")
  }
}
