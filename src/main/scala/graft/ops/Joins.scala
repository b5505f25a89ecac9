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

  /** As-of join: each `left` row picks the LATEST `right` row with the
    * same `key` and `right.ts <= left.ts` (inclusive) — the
    * point-in-time lookup (price as of trade time, last session event
    * before a conversion) that equi-joins can't express and a naive
    * theta-join explodes to per-key cross products.
    *
    * Spark-first shape: both sides union into ONE frame tagged by side,
    * shuffled ONCE on `key`, and a running `last(payload, ignoreNulls)`
    * over the (ts, side-tag) order carries each right row forward to
    * every later left row — O(n log n) per key for any match density,
    * versus the theta-join's O(left·right) per key. Right rows sort
    * before left rows at equal ts (inclusive semantics); among several
    * right rows at the SAME (key, ts) the greatest payload struct wins
    * (deterministic — pre-aggregate the right side if another rule is
    * wanted). Left-join semantics: unmatched left rows keep null
    * payload columns.
    *
    * At 100 TB the shuffle is on `key` — per-key history must fit a
    * task (same bound as any windowed sessionization); a pathological
    * single-key stream should pre-split by time range.
    *
    * @param payload   right-side columns to carry (must not collide
    *                  with left column names; the right frame needs
    *                  only `key`, `ts`, and these)
    * @param tolerance optional maximum lookback (e.g. "30 minutes" —
    *                  any Spark interval literal): a right row older
    *                  than `left.ts - tolerance` does not match and the
    *                  payload stays null, the pandas `merge_asof`
    *                  tolerance semantics. Same plan shape — the bound
    *                  is a post-carry filter, not a join change.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], tolerance: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "at least one right payload column required")
    require(payload.forall(right.columns.contains),
      s"payload columns missing from right frame: ${payload.filterNot(right.columns.contains).mkString(", ")}")
    require(!payload.exists(left.columns.contains),
      s"payload columns collide with left columns: ${payload.filter(left.columns.contains).mkString(", ")}")
    val tag = "__graft_asof_tag"
    val pay = "__graft_asof_pay"
    val leftExtra = left.columns.filterNot(c => c == key || c == ts)
    // the matched right row's own ts rides in the payload struct so a
    // tolerance bound can be applied after the carry (leading position
    // keeps the equal-ts tie-break ordering unchanged: ties compare
    // equal on it and fall through to the payload fields)
    val payStruct = struct(col(ts).as("__graft_rts") +: payload.map(col): _*)
    val lTagged = left
      .withColumn(tag, lit(1))
      .withColumn(pay, lit(null).cast(right.select(payStruct).schema.head.dataType))
    val rTagged = leftExtra.foldLeft(
        right.withColumn(tag, lit(0)).withColumn(pay, payStruct)
          .select(col(key), col(ts), col(tag), col(pay))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(ts).asc, col(tag).asc, col(pay).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val inTolerance = tolerance
      .map(t => col(s"$pay.__graft_rts") >= col(ts) - expr(s"INTERVAL $t"))
      .getOrElse(lit(true))
    lTagged.unionByName(rTagged)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .filter(col(tag) === 1)
      .select(left.columns.map(col) ++
        payload.map(p => when(inTolerance, col(s"$pay.$p")).as(p)): _*)
  }

  /** Exact interval-containment join (`left.ts ∈ [start, end]`) without
    * a nested loop: each interval explodes to the calendar days it
    * covers, each row bins to its day, and the join becomes an
    * EQUI-join on the day key with the exact containment predicate as a
    * residual filter — the standard binned range join. No duplicates:
    * a row has exactly one day bin, so each (row, interval) pair meets
    * at most once.
    *
    * Scale: the naive form is a BroadcastNestedLoopJoin (every row ×
    * every interval) that only survives while the interval side is
    * tiny; binned, it is a shuffle/broadcast HASH join keyed by day
    * whose cost is rows + interval-days. Bin width is a day because the
    * day grid is cheap to mirror cross-engine; a production variant
    * would pick the bin near the median interval length.
    */
  def rangeJoinByDay(left: DataFrame, ts: String,
                     intervals: DataFrame, start: String, end: String): DataFrame = {
    // same collision contract asofJoin enforces: a column name shared
    // by both frames would come out duplicated and ambiguous
    val shared = intervals.columns.toSet.intersect(left.columns.toSet)
    require(shared.isEmpty,
      s"interval columns collide with left columns: ${shared.toSeq.sorted.mkString(", ")}")
    val bin = "__graft_day"
    // an inverted interval (end < start) contains nothing — drop it up
    // front rather than let `sequence` reject the descending range and
    // kill the whole job over one malformed row
    val binned = intervals.filter(col(start) <= col(end)).withColumn(bin,
      explode(sequence(to_date(col(start)), to_date(col(end)), expr("interval 1 day"))))
    left.withColumn(bin, to_date(col(ts)))
      .join(binned, Seq(bin))
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop(bin)
  }
}
