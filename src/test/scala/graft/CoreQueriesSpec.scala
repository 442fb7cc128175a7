package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.CoreQueries
import graft.sources.Tables

class CoreQueriesSpec extends SparkSpec {

  test("J1: nest/unnest row count equals source row count") {
    val n = Tables.load(spark, sf, "events").count()
    assert(CoreQueries.nestUnnest(spark, sf).count() == n)
  }

  test("J1: unnest index is 0-based and dense per user") {
    val df = CoreQueries.nestUnnest(spark, sf)
    val bad = df.groupBy("user_id")
      .agg(min("idx").as("mn"), max("idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("F1: murmur3 hash bucket stays in range and is deterministic") {
    // Spark-native variant of trainer.py:262-267 (not oracle-checkable:
    // DuckDB has no murmur3(seed=42))
    val n = 40 // 8 distinct * 5, trainer.py:264
    val df = Tables.load(spark, sf, "documents")
      .select(pmod(hash(col("lang")), lit(n)).as("bucket"))
    val Array(mn, mx) = df.agg(min("bucket"), max("bucket")).collect()(0)
      .toSeq.map(_.asInstanceOf[Int]).toArray
    assert(mn >= 0 && mx < n)
    val a = df.collect().map(_.getInt(0))
    val b = df.collect().map(_.getInt(0))
    assert(a.sameElements(b))
  }

  test("S4+B.2: JSON schema inference + golden flatten of nested trace") {
    // Reference-shaped nested trace fixture (FIXTURES.md §B.2;
    // reference README.md:70-103, notebook cell 7)
    val tmp = Files.createTempDirectory("trace").toString
    val ndjson = Seq(
      """{"traceEvents":[
        |{"ph":"X","cat":"Op","name":"MatMul","pid":1,"tid":7,"ts":100,"dur":30,"args":{"name":"dense/MatMul","op":"MatMul"}},
        |{"ph":"X","cat":"Op","name":"Cast","pid":1,"tid":7,"ts":130,"dur":5,"args":{"name":"Shape/Cast","op":"Cast"}},
        |{"ph":"M","cat":"Op","name":"process_name","pid":1,"tid":0,"ts":0,"dur":0,"args":{"name":"proc","op":"meta"}}
        |]}""".stripMargin.replaceAll("\n", ""),
      """{"traceEvents":[
        |{"ph":"X","cat":"Op","name":"MatMul","pid":2,"tid":3,"ts":200,"dur":40,"args":{"name":"dense/MatMul","op":"MatMul"}}
        |]}""".stripMargin.replaceAll("\n", "")).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/trace.json"), ndjson)

    val traces = spark.read.json(s"$tmp/trace.json") // schema autodetect (S4)
    val flat = traces
      .select(posexplode(col("traceEvents")).as(Seq("index", "traceEvent")))
      .select(
        col("index"), col("traceEvent.ph"), col("traceEvent.cat"),
        col("traceEvent.name"), col("traceEvent.pid"), col("traceEvent.tid"),
        col("traceEvent.ts"), col("traceEvent.dur"),
        col("traceEvent.args.name").as("arg_name"),
        col("traceEvent.args.op").as("arg_op"))
    // golden: flattened columns exactly as notebook cell 7
    assert(flat.columns.toSeq == Seq("index", "ph", "cat", "name", "pid",
      "tid", "ts", "dur", "arg_name", "arg_op"))
    assert(flat.count() == 4) // sum(size(traceEvents))
    // cell-8 aggregate over the flattened table
    val agg = flat.filter(col("ph") === "X")
      .groupBy("arg_name")
      .agg(sum("dur").as("total_dur"), avg("dur").as("avg_dur"),
        min("dur").as("min_dur"), max("dur").as("max_dur"))
      .orderBy(desc("total_dur")).limit(20).collect()
    assert(agg.head.getString(0) == "dense/MatMul")
    assert(agg.head.getLong(1) == 70L)
  }

  test("S6+S7: CTAS temp view sink and single-file JSON sink") {
    val tmp = Files.createTempDirectory("sink").toString
    val topk = Queries.eventsTopK(spark, sf)
    topk.createOrReplaceTempView("events_topk") // CTAS-style named result
    assert(spark.table("events_topk").count() == topk.count())
    // S7 (trainer.py:362-381): merge + single JSON dump
    topk.coalesce(1).write.mode("overwrite").json(s"$tmp/out")
    val back = spark.read.json(s"$tmp/out")
    assert(back.count() == topk.count())
  }

  test("format breadth: ORC and CSV write/read roundtrips") {
    val tmp = Files.createTempDirectory("fmt").toString
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").orc(s"$tmp/orc")
    li.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    assert(spark.read.orc(s"$tmp/orc").count() == li.count())
    val csvBack = spark.read.option("header", "true")
      .schema(li.schema).csv(s"$tmp/csv")
    assert(csvBack.count() == li.count())
    assert(csvBack.agg(sum("l_quantity")).collect()(0).getDouble(0) ==
      li.agg(sum("l_quantity")).collect()(0).getDouble(0))
  }

  test("P3 robustness: corrupt JSON records land in _corrupt_record") {
    val tmp = Files.createTempDirectory("corrupt").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/mixed.json"),
      """{"a": 1, "b": "ok"}
        |this is not json at all
        |{"a": 2, "b": "fine"}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$tmp/mixed.json").cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("a").isNotNull).count() == 2)
    df.unpersist()
  }

  test("M3: repeat epochs triples every group count") {
    val perEpoch = CoreQueries.repeatEpochs(spark, sf)
      .groupBy("event_type").agg(countDistinct("epoch").as("n_epochs"))
    assert(perEpoch.filter(col("n_epochs") =!= 3).count() == 0)
  }

  test("M5: batch sizes are 512 except the tail") {
    val sizes = CoreQueries.batchStats(spark, sf)
      .select("batch_rows").collect().map(_.getLong(0))
    assert(sizes.init.forall(_ == 512L))
    assert(sizes.last <= 512L)
  }
}
