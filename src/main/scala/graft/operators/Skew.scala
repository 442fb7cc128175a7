package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join. AQE's skew-join split handles
  * most skew automatically (and is on by default in every Graft
  * session); salting is the explicit form for pathological keys —
  * e.g. a null-heavy or power-law foreign key where one reducer would
  * otherwise receive a large fraction of a 100 TB fact table.
  *
  * Shape: the large side gets a uniform salt in [0, salt); the small
  * side is replicated salt× with every salt value; the join key
  * becomes (key, salt) so each hot key spreads over `salt` reducers.
  * Result is row-identical to the plain join.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // right/full outer would emit `salt` null-padded copies of any
    // unmatched small-side row (it is replicated before the join) —
    // only join types that never emit unmatched small rows are sound
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // salt value only affects distribution, not results — derive it
    // deterministically from the row's key + a per-row hash
    val salted = large.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val out = salted.join(replicated,
      Seq(key, "_salt"), joinType)
    out.drop("_salt")
  }
}
