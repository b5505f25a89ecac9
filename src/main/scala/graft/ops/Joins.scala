package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY §4 / 100 TB posture).
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is
  * the explicit tool for the pathological case AQE can't fix — a single
  * hot key whose rows exceed one executor's memory on the build side of
  * a shuffle join.
  */
object Joins {

  /** Equi-join `big ⋈ small` on `key`, salting the hot keys: the big
    * side scatters each row into one of `salts` sub-keys, the small
    * side replicates every row to all `salts` sub-keys, so one hot key
    * spreads over `salts` shuffle partitions instead of one.
    *
    * Deterministic: the scatter salt is `pmod(hash(bigId), salts)`
    * (any stable per-row column works — monotonically_increasing_id is
    * NOT stable across retries, so the caller names one).
    *
    * Result equals `big.join(small, key)` exactly; only the shuffle
    * distribution differs.
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      scatterBy: Column,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt", pmod(hash(scatterBy), lit(salts)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
