package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Presentation ordering for small results of expensive pipelines. */
object Present {

  /** Globally sorted output in a single partition. A plain `orderBy`
    * is TWO passes over its input — the range-partitioner's boundary
    * sampling job, then the sort shuffle — so terminating an expensive
    * pair/audit pipeline with one doubles the pipeline's cost for an
    * ordering that fits a single task anyway. Shuffling the tiny
    * result to one partition and sorting there is one pass over the
    * input plus one in-memory sort.
    *
    * Use ONLY for outputs that fit a task (pair lists, decision and
    * audit tables, rollups). A large ordered output wants `orderBy`'s
    * range exchange — and a 100 TB corpus write wants no global order
    * at all.
    */
  def smallSorted(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.map(col): _*)

  /** HTML table rendering of a REPORT-sized result — the notebook's
    * `df.to_html()` affordance (reference sample.ipynb cells 9/13)
    * for the client-result surface `show()` doesn't cover. Collects
    * at most `maxRows` + 1 (the extra row only proves truncation —
    * the table is capped and says so), escapes every cell, renders
    * nulls as a distinguishable marker, and right-aligns numeric
    * columns. Driver-side BY CONTRACT: rendering is for eyes, so the
    * input must already be a report (the cap enforces it — this is
    * never a data-movement operator).
    */
  def toHtml(df: DataFrame, maxRows: Int = 100): String = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val rows = df.take(maxRows + 1)
    val truncated = rows.length > maxRows
    val shown = if (truncated) rows.take(maxRows) else rows
    val schema = df.schema
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }
    val numeric = schema.fields.map(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    })
    val sb = new StringBuilder
    sb.append("<table border=\"1\" class=\"dataframe\">\n<thead><tr>")
    schema.fields.foreach(f =>
      sb.append("<th>").append(esc(f.name)).append("</th>"))
    sb.append("</tr></thead>\n<tbody>\n")
    shown.foreach { r =>
      sb.append("<tr>")
      var i = 0
      while (i < schema.length) {
        val align = if (numeric(i)) " style=\"text-align:right\"" else ""
        val cell =
          if (r.isNullAt(i)) "<em>null</em>"
          else esc(String.valueOf(r.get(i)))
        sb.append(s"<td$align>").append(cell).append("</td>")
        i += 1
      }
      sb.append("</tr>\n")
    }
    sb.append("</tbody></table>")
    if (truncated)
      sb.append(s"\n<p>showing first $maxRows rows (truncated)</p>")
    sb.toString
  }
}
