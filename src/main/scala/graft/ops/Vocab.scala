package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training corpus statistics: the unigram vocabulary and the
  * adjacent-pair counts that seed BPE merges.
  *
  * Scale shape: both are wordcount — explode once, one groupBy shuffle
  * on the token/pair key with map-side partial aggregation, then
  * `orderBy(...).limit(k)` which Spark plans as TakeOrderedAndProject
  * (per-partition top-k, driver merges k·partitions rows — never a
  * global sort of the vocabulary). Deterministic output via the
  * (count desc, key asc) tie-break.
  */
object Vocab {

  /** Top-`k` whitespace tokens (lowercased) by count. */
  def topTokens(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(explode(split(lower(trim(text)), "\\s+")).as("token"))
      // empty/whitespace-only docs split to [""] — not a vocabulary entry
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }

  /** Joiner char marking merged symbols in [[bpeMergeRounds]] — outside
    * every pre-token class (pre-tokens are letter runs / digits / single
    * marks, and control chars only appear as their own single-char
    * token, never inside one), so a merged symbol cannot collide with a
    * later pair key by accident. chr(1) in the DuckDB mirror.
    */
  private[graft] val MergeJoiner = "\u0001"

  /** `k` rounds of GREEDY BPE merges over the corpus pre-token stream —
    * the actual trainer loop, not just the round-1 candidate table
    * ([[topBpePairs]]): each round counts adjacent-pair frequencies,
    * takes the single most frequent pair (ties broken by pair text, so
    * the choice is deterministic cross-engine), rewrites every
    * occurrence (leftmost non-overlapping, the standard greedy BPE
    * application — both engines' literal `replace` semantics), and
    * repeats on the rewritten stream. Returns the merge table
    * (merge_rank, pair, n) a tokenizer would apply in rank order.
    *
    * Scale shape: the FK-closure pattern — a driver loop of `k` tiny
    * top-1 aggregations (each collects ONE row; the corpus itself never
    * leaves the executors) over a `localCheckpoint`ed rewrite, so round
    * i's plan reads round i-1's materialized blocks instead of
    * replaying i-1 rewrite stages. Each round is one wordcount shuffle
    * + a narrow string rewrite — at 100 TB a real deployment trains on
    * a corpus sample, exactly as this runs on whatever `df` it is
    * given. Stops early if no adjacent pairs remain.
    */
  def bpeMergeRounds(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // sentinel-padded pre-token stream with TWO-space gaps
    // ("  t1  t2  ...  tn  "): a pair match "␣a␣␣b␣" consumes one space
    // of each flanking gap, leaving the other intact — so consecutive
    // DISJOINT occurrences ("a b a b" → both merge) don't steal each
    // other's delimiter, while occurrences sharing a middle token
    // ("b b b" → only the first merges) still exclude each other:
    // exactly greedy leftmost non-overlapping BPE application. A
    // single-space scheme gets this wrong — the shared delimiter makes
    // `replace` skip every other adjacent occurrence. The two-space
    // invariant is restored by each rewrite (1 leftover + 1 replacement
    // space per side); token boundaries stay unmergeable ("b a" inside
    // "ab  a" never matches "␣b␣␣a␣").
    var corpus = df.select(
        concat(lit("  "),
          concat_ws("  ", regexp_extract_all(lower(text), lit(TextAnalysis.BpeClass), lit(0))),
          lit("  ")).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val toks = split(trim(col("s")), " +")
      val pairs = TextAnalysis.bound(toks) { a =>
        when(size(a) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(a) - 1),
            i => concat(element_at(a, i), lit(" "), element_at(a, i + 1))))
      }
      val top = corpus.select(explode(pairs).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .as[(String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (pair, n) = top(0)
        merges += ((round, pair, n))
        corpus = corpus.select(
            replace(col("s"), lit(" " + pair.replace(" ", "  ") + " "),
              lit(" " + pair.replace(" ", MergeJoiner) + " ")).as("s"))
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "pair", "n")
  }

  /** Top-`k` adjacent BPE pre-token pairs by count — the merge-candidate
    * table of a BPE trainer's first iteration. Pre-tokens follow
    * [[TextAnalysis.bpeTokenCount]]'s portable class (letter runs,
    * single digits, single marks); the pair key is the two pre-tokens
    * space-joined.
    */
  def topBpePairs(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = regexp_extract_all(lower(text), lit(TextAnalysis.BpeClass), lit(0))
    val pairs = TextAnalysis.bound(toks) { a =>
      when(size(a) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(a) - 1),
          i => concat(element_at(a, i), lit(" "), element_at(a, i + 1))))
    }
    df.select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }
}
