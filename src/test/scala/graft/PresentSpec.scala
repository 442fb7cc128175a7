package graft

import org.apache.spark.sql.functions._
import graft.operators.Present

/** The client-result presentation surface: single-pass small sort and
  * the notebook-parity HTML renderer (reference sample.ipynb cells
  * 9/13, `df.to_html()`).
  */
class PresentSpec extends SparkSpec {

  test("smallSorted: one partition, globally ordered, same rows") {
    import spark.implicits._
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    val out = Present.smallSorted(df, "k")
    assert(out.rdd.getNumPartitions == 1)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("toHtml renders schema, escaping, nulls, alignment, truncation") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), "<b>&\"bold\""),
      (2L, None, "plain")
    ).toDF("id", "score", "t<xt")
    val html = Present.toHtml(df.orderBy("id"))
    // header escaped
    assert(html.contains("<th>t&lt;xt</th>"))
    // cell content escaped, not interpreted
    assert(html.contains("&lt;b&gt;&amp;&quot;bold&quot;"))
    assert(!html.contains("<b>&"))
    // null marker and numeric right-alignment
    assert(html.contains("<em>null</em>"))
    assert(html.contains("style=\"text-align:right\">1</td>"))
    // two body rows, no truncation note
    assert(html.sliding(4).count(_ == "<tr>") == 3) // 1 head + 2 body
    assert(!html.contains("truncated"))
    // truncation: cap at maxRows and say so
    val big = spark.range(0, 10).toDF("id")
    val capped = Present.toHtml(big, maxRows = 4)
    assert(capped.sliding(4).count(_ == "<tr>") == 5) // 1 head + 4 body
    assert(capped.contains("showing first 4 rows (truncated)"))
    // exactly maxRows rows: NOT flagged as truncated
    val exact = Present.toHtml(spark.range(0, 4).toDF("id"), maxRows = 4)
    assert(!exact.contains("truncated"))
  }
}
