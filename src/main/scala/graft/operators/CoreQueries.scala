package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational surface of the engine — the reference's scan /
  * project / flatten / aggregate / reshape inventory (SURVEY.md §2),
  * re-expressed as declarative DataFrame plans so Catalyst handles
  * pushdown, pruning, partial aggregation and top-k fusion.
  */
object CoreQueries {

  /** S3+P1+P5 (reference trainer.py:189-208 scan; notebook cell 7
    * projection): filtered, pruned scan with a derived column. The
    * filter and the 5-column projection both reach the parquet reader
    * (PushedFilters / ReadSchema) — at 100 TB this is the difference
    * between reading ~45% of rows of 5 columns and the whole table.
    */
  def scanPruneFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        col("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P3 (reference trainer.py:120-163): per-column defaults for
    * missing values — schema-on-read plus coalesce, the Spark analog
    * of `tf.io.FixedLenFeature(default_value=...)`. Nulls are
    * synthesized with nullif since the testdata is dense.
    */
  def fillDefaults(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        coalesce(nullif(col("lang"), lit("en")), lit("unknown"))
          .as("lang_or_default"),
        coalesce(nullif(col("source"), lit("src0")), lit(""))
          .as("source_or_default"))
      .orderBy("doc_id")

  /** F6 (reference trainer.py:367,372 json.loads/dumps): JSON parse of
    * the `props` column with a declared schema — `from_json` is a
    * codegen'd Catalyst expression, not a UDF, so it stays inside
    * whole-stage codegen on a 100 TB scan.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k"))
      .orderBy("event_id")

  /** J1+P1+F5+M6 (notebook cell 7: `UNNEST(traceEvents) WITH OFFSET`):
    * the reference's only join — lateral flatten of a nested array
    * with element position. The testdata has no nested table, so the
    * nest is built in-query (collect_list of structs, sorted for
    * determinism) and then posexploded back; output row count must be
    * sum(size(array)).
    */
  def nestUnnest(spark: SparkSession, sfDir: String): DataFrame = {
    val nested = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(
        col("event_id"), col("event_type"), col("value")))).as("evs"))
    nested
      .select(col("user_id"), posexplode(col("evs")).as(Seq("idx", "ev")))
      .select(
        col("user_id"), col("idx"),
        col("ev.event_id").as("event_id"),
        col("ev.event_type").as("event_type"),
        col("ev.value").as("value"))
      .orderBy("user_id", "idx")
  }

  /** A3 (reference trainer.py:91-118 `vocab_size`): exact per-column
    * distinct counts — the column-statistics table the reference
    * hand-maintains, computed in one pass. (The HLL sketch variant
    * lives in graft.functions.Hll; exact form is the oracle-checkable
    * one.)
    */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .agg(
        countDistinct(col("l_returnflag")).as("n_returnflag"),
        countDistinct(col("l_linestatus")).as("n_linestatus"),
        countDistinct(col("l_partkey")).as("n_partkey"),
        countDistinct(col("l_suppkey")).as("n_suppkey"),
        countDistinct(col("l_orderkey")).as("n_orderkey"))

  /** A2+M6 (reference trainer.py:36 `select count(1)`; trainer.py:363
    * union of event lists): global counts across tables, merged with
    * unionAll — each count is a metadata-cheap scan.
    */
  def tableCounts(spark: SparkSession, sfDir: String): DataFrame = {
    def one(t: String) =
      Tables.load(spark, sfDir, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("tbl"), col("n_rows"))
    Seq("lineitem", "orders", "customer", "events", "documents")
      .map(one).reduce(_ union _)
      .orderBy("tbl")
  }

  /** F1-analog with a portable hash (reference trainer.py:262-267
    * `categorical_column_with_hash_bucket`): bucket a key into
    * `distinct*5` buckets. Uses a multiplicative (Knuth) hash that is
    * exactly expressible in ANSI SQL so the oracle can replay it; the
    * Murmur3 variant (Spark-native `hash()`) is covered by unit tests
    * instead since DuckDB cannot reproduce it.
    */
  def featureBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val nBuckets = 200 * 5 // p_partkey distinct count * 5, trainer.py:264
    Tables.load(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        pmod(col("p_partkey") * lit(2654435761L), lit(nBuckets.toLong))
          .as("bucket"))
      .orderBy("p_partkey")
  }

  /** F3 (reference `*_norm` columns, trainer.py:124-136): z-score
    * normalization per group via window aggregates — one shuffle on
    * the group key, no driver-side stats pass.
    */
  def normalize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"), col("event_type"),
        round((col("value") - avg("value").over(w)) /
          stddev_samp("value").over(w), 4).as("value_norm"))
      .orderBy("event_id")
  }

  /** M2 (reference .shuffle(10000), trainer.py:220): deterministic
    * pseudo-random permutation — ordering by a multiplicative hash of
    * the key gives a reproducible shuffle both engines agree on
    * (`rand(seed)` would diverge from DuckDB's generator). At scale
    * this is a single global sort; for shuffle-without-order semantics
    * `repartition(n, col)` is the cheaper idiom.
    */
  def deterministicShuffle(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"),
        pmod(col("event_id") * lit(2654435761L), lit(1 << 20)).as("shuffle_key"))
      .orderBy("shuffle_key", "event_id")
      .limit(100)

  /** M3 (reference .repeat(num_epochs), trainer.py:221): epoch
    * expansion as a union of the dataset with itself, each copy
    * tagged — then verified by a per-epoch count.
    */
  def repeatEpochs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val epochs = (0 until 3)
      .map(i => ev.select(lit(i).as("epoch"), col("event_type")))
      .reduce(_ union _)
    epochs.groupBy("epoch", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("epoch", "event_type")
  }

  /** M5 (reference .batch(batch_size), trainer.py:222): fixed-size
    * batching as a logical operation — batch id from the global row
    * number over a total order, then per-batch stats. The row number is
    * a sharded two-pass prefix sum of 1s ([[PrefixSum]]) rather than a
    * single-partition window, so it parallelizes at any scale. Spark's
    * physical batching (ColumnarBatch) is automatic; this is the
    * logical equivalent.
    */
  def batchStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("value"))
    PrefixSum.withGlobalCumSum(ev, "event_id", lit(1), "rn",
        shardWidth = 4096)
      .select(col("event_id"), col("value"),
        ((col("rn") - 1) / 512).cast("long").as("batch_id"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("batch_rows"),
        round(sum("value"), 4).as("batch_value"))
      .orderBy("batch_id")
  }

  /** S2 in its genuine form (reference trainer.py:185-186: gzipped
    * TFRecord streams) — round 1 mapped raw record scans to
    * `binaryFile`, which reads whole files; the `recordstream` DSv2
    * connector ([[graft.sources.RecordStreamSource]]) reads the
    * records INSIDE them, TFRecord-framed (length + masked-crc32c)
    * and gzipped. This query drives the full loop: write the
    * documents table through the DSv2 sink (one file per task), read
    * it back through the DSv2 scan (one partition per file — the
    * reference's file-count parallelism, M4), parse the payloads
    * downstream (P3's parse role), aggregate per language. The oracle
    * computes the same aggregate from the parquet table, so the hash
    * compare proves the frame→checksum→read→parse path lossless.
    */
  def recordStreamAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // path keyed by a digest of the ABSOLUTE input dir plus the JVM:
    // two concurrent processes (or two SF dirs sharing a basename)
    // never write the same directory
    val keySrc = new java.io.File(sfDir).getAbsolutePath + "@" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(keySrc.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-recordstream-q108-$key").getAbsolutePath
    Tables.load(spark, sfDir, "documents")
      .select(encode(concat_ws("\t",
        col("doc_id"), col("lang"), col("text")), "UTF-8").as("value"))
      .write.format("recordstream").mode("overwrite").save(dir)
    // limit=3: the first two fields are tab-free keys, so any tabs in
    // the text body stay intact
    spark.read.format("recordstream").load(dir)
      .select(split(decode(col("value"), "UTF-8"), "\t", 3).as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).as("text"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_ids"),
        sum(length(col("text"))).as("sum_chars"))
      .orderBy("lang")
  }
}
