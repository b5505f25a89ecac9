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
