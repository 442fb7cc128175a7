package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared guard for iterative operators that retune session-global
  * confs for the duration of a loop (PageRank's pre-planned broadcast
  * regime, ConnectedComponents' small-graph regime).
  *
  * `spark.conf.set` is session-scoped, so a loop that flips
  * `spark.sql.adaptive.enabled` silently re-plans any OTHER query the
  * same session runs concurrently, and two concurrent loops can
  * clobber each other's saved values on restore. This helper
  * serializes the tuned sections per JVM: at most one tuned loop runs
  * at a time, the saved values are always the true pre-loop values,
  * and restore happens in `finally`. Queries outside a tuned section
  * are unaffected (they only ever see either the default or a fully
  * restored conf — never a torn half-regime).
  *
  * The lock is per-JVM rather than per-session: local mode (and every
  * test/bench entry here) runs one session per JVM, and a cluster
  * driver tuning two sessions concurrently still wants the loops
  * serialized — the cost is loop latency, never correctness.
  */
object LoopRegime {

  private val lock = new Object

  /** Run `body` with `confs` applied, serialized against every other
    * tuned loop in this JVM; always restores the pre-existing values
    * (or clears keys that were unset).
    */
  def withConfs[T](spark: SparkSession, confs: Map[String, String])
      (body: => T): T = lock.synchronized {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
