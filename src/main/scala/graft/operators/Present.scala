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
}
