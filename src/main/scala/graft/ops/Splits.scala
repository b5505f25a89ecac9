package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextAnalysis.{md5PrefixLong, md5PrefixLongSql}

/** Held-out split management for training corpora: deterministic
  * train/val/test assignment plus the cross-split near-duplicate
  * (leakage) audit and quarantine that make the split trustworthy.
  *
  * Train-test overlap is the canonical silent evaluation bug (GPT-3,
  * Brown et al. 2020 App. C measures it post-hoc; Lee et al. 2021 §6.2
  * shows deduplication shifts eval perplexity exactly because of it).
  * The operators here make the split a *property of the data*, not of
  * a job: assignment is a pure hash of a caller-chosen key — stable
  * across reruns, engines, partitionings and corpus growth — and the
  * audit/quarantine pair detects and repairs near-dup bridges that
  * cross split boundaries.
  *
  * Scale shape: assignment is a narrow per-row expression (no shuffle,
  * no lookup table — a new shard gets consistent labels with zero
  * coordination, the property that matters when 100 TB arrives as
  * daily increments). The audit joins an (id_a, id_b) near-dup pair
  * table — already blocked/bucketed by the upstream dedup operator —
  * against the skinny (id, split) projection twice; both joins are
  * id-equi-joins AQE can broadcast when the pair side is small.
  *
  * Cross-engine exactness: the bucket is [[TextAnalysis.md5PrefixLong]]
  * (the repo-wide portable-hash idiom) mod 10000, so Spark and DuckDB
  * agree bit-for-bit; fractions quantize to basis points.
  */
object Splits {

  /** Default 90/5/5 split. Order matters: earlier entries own the
    * lower hash buckets.
    */
  val DefaultFractions: Seq[(String, Double)] = Seq(
    "train" -> 0.90, "val" -> 0.05, "test" -> 0.05)

  /** Eviction priority when a near-dup pair crosses splits: the member
    * of the LOWER-priority split is quarantined, so training data is
    * never discarded to protect an eval set — the contaminated eval
    * doc leaves instead (the direction Brown et al. 2020 App. C
    * cleans).
    */
  val SplitPriority: Seq[String] = Seq("train", "val", "test")

  private def bucketBps(key: Column, salt: String): Column =
    md5PrefixLong(concat(lit(salt), key.cast("string")), 8) % 10000

  private def bucketBpsSql(keySql: String, salt: String): String =
    s"(${md5PrefixLongSql(s"concat('$salt', CAST($keySql AS VARCHAR))", 8)} % 10000)"

  private def cumBps(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    val bps = fractions.map { case (n, f) => n -> math.round(f * 10000) }
    val total = bps.map(_._2).sum
    require(total == 10000,
      s"split fractions must sum to 1 (within basis-point rounding); got $total bps")
    bps.scanLeft(("", 0L)) { case ((_, acc), (n, b)) => (n, acc + b) }.tail
  }

  /** Label every row with a deterministic split: rows hash into 10000
    * buckets by `salt`+`key` and the cumulative `fractions` carve the
    * bucket range. Keying by a CONTENT fingerprint (not a row id) puts
    * exact duplicates in the same split by construction; keying by a
    * stable id keeps a document's split fixed even when its text is
    * edited. Both are one narrow expression — no state, no shuffle.
    */
  def splitAssign(df: DataFrame, key: Column,
                  fractions: Seq[(String, Double)] = DefaultFractions,
                  salt: String = ""): DataFrame = {
    val b = bucketBps(key, salt)
    val cum = cumBps(fractions)
    // last range is the `otherwise`, so bucket 9999 always lands
    val expr = cum.init.foldRight(lit(cum.last._1): Column) {
      case ((name, hi), rest) => when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** SQL mirror of [[splitAssign]]'s `split` expression. */
  def splitAssignSql(keySql: String,
                     fractions: Seq[(String, Double)] = DefaultFractions,
                     salt: String = ""): String = {
    val b = bucketBpsSql(keySql, salt)
    val cum = cumBps(fractions)
    cum.init.map { case (name, hi) => s"WHEN $b < $hi THEN '$name'" }
      .mkString("CASE ", " ", s" ELSE '${cum.last._1}' END")
  }

  /** Leakage audit: near-dup pairs whose two members were assigned
    * DIFFERENT splits — each one is an eval example the model may have
    * trained on. `pairs` is any (id_a, id_b) near-dup pair table (exact
    * n-gram Jaccard, MinHash-LSH, SemDeDup — they all emit this shape);
    * `assign` maps id → split. Extra `pairs` columns (e.g. jaccard)
    * ride along.
    */
  def crossSplitPairs(pairs: DataFrame, assign: DataFrame,
                      id: String, splitCol: String = "split"): DataFrame = {
    val a = assign.select(col(id).as("id_a"), col(splitCol).as("split_a"))
    val b = assign.select(col(id).as("id_b"), col(splitCol).as("split_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .filter(col("split_a") =!= col("split_b"))
  }

  /** Quarantine list: for every cross-split near-dup pair, the member
    * of the lower-[[SplitPriority]] split must leave its split. Returns
    * one row per distinct evicted doc: (id, split, leak_of) where
    * `leak_of` is the smallest higher-priority counterpart id (the
    * evidence row; min() makes the report deterministic under any join
    * order). Dropping these ids from the eval sets restores the
    * no-overlap invariant without touching train.
    */
  def quarantine(pairs: DataFrame, assign: DataFrame,
                 id: String, splitCol: String = "split"): DataFrame = {
    def pr(c: Column): Column =
      SplitPriority.zipWithIndex.foldRight(lit(SplitPriority.size): Column) {
        case ((name, i), rest) => when(c === name, lit(i)).otherwise(rest)
      }
    val crossed = crossSplitPairs(pairs, assign, id, splitCol)
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
        pr(col("split_a")).as("pa"), pr(col("split_b")).as("pb"))
    // evict the higher-rank (lower-priority) side; ranks differ because
    // the splits differ and SplitPriority is injective
    val evicted = crossed.select(
      when(col("pa") > col("pb"), col("id_a")).otherwise(col("id_b")).as(id),
      when(col("pa") > col("pb"), col("split_a")).otherwise(col("split_b")).as(splitCol),
      when(col("pa") > col("pb"), col("id_b")).otherwise(col("id_a")).as("leak_of"))
    evicted.groupBy(col(id), col(splitCol))
      .agg(min(col("leak_of")).as("leak_of"))
  }
}
