package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("dbg").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // replicate the loop with round counting on the sf0.1 chain graph
    val c = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "customer")
      .select(col("c_custkey").as("k"))
    val next = c.select(col("k").as("a"), (col("k") + 1L).as("b"))
    val skip = c.select(col("k").as("a"), (col("k") + 2L).as("b"))
    val present = c.select(col("k").as("b"))
    val edges = next.unionAll(skip).join(present, Seq("b"), "left_semi")
      .filter(expr("a DIV 1000 = b DIV 1000"))
    var cur = edges.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    var prev: java.math.BigDecimal = null; var pc = -1L
    var done = false; var round = 0
    val t0 = System.nanoTime()
    while (!done && round < 64) {
      val bidir = cur.select(col("a").as("u"), col("b").as("v"))
        .unionAll(cur.select(col("b").as("u"), col("a").as("v")))
      val mins = bidir.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val afterLarge = bidir.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val smins = afterLarge.groupBy(col("a").as("u")).agg(min("b").as("m"))
      val afterSmall = smins.select(col("u").as("a"), col("m").as("b"))
        .unionAll(afterLarge.join(smins, afterLarge("a") === smins("u"))
          .filter(col("b") =!= col("m")).select(col("b").as("a"), col("m").as("b")))
        .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)
      val p = afterSmall.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)"))).head()
      val cnt = p.getLong(0); val chk = p.getDecimal(1)
      done = cnt == pc && prev != null && chk.compareTo(prev) == 0
      pc = cnt; prev = chk; cur = afterSmall; round += 1
      println(f"round $round cnt $cnt t ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
