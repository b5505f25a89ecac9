package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled from per-module packs under
  * `graft.queries`; every key present in `queries` with a matching
  * `oracleSql` entry is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.CoreQueries.queries, graft.queries.CoreQueries.oracle),
      (graft.queries.TransformQueries.queries, graft.queries.TransformQueries.oracle),
      (graft.queries.SubsetQueries.queries, graft.queries.SubsetQueries.oracle),
      (graft.queries.IngestQueries.queries, graft.queries.IngestQueries.oracle),
      (graft.queries.OpsQueries.queries, graft.queries.OpsQueries.oracle),
      (graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracle),
      (graft.queries.StoreQueries.queries, graft.queries.StoreQueries.oracle),
      (graft.queries.EventQueries.queries, graft.queries.EventQueries.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)

  /** Queries whose first measured bench pass may legitimately do extra
    * pay-once work — a persisted-artifact build behind an
    * `ArtifactCache.isComplete` guard, a bucketed-table layout write,
    * or a train-once model fit. Their pass-1-vs-pass-2 wall spread is
    * the DESIGNED ingest-once lifecycle (pass 1 pays the build, later
    * passes read it), so Bench subtracts them — when the measured
    * spread shape actually IS `pass1-work` — from
    * `n_spread_actionable`; a declared query whose spread measures
    * `pass2-work` still counts as actionable (nothing should get
    * slower when warm). r16 verdict #3: with the designed flags
    * declared, a clean sweep is machine-checkable as actionable == 0.
    */
  val expectedPass1Work: Set[String] = Set(
    // train-once logistic fit (ArtifactCache-keyed weights)
    "x_quality_logit_trained",
    // bucketed-table layout written on first touch
    "j6_bucketed_join",
    // shared pay-once corpus exact-pairs artifact (built by whichever
    // consumer runs first; all four can build it when cold)
    "x_cluster_best_rep", "x_incremental_near_dup_precision",
    "x_split_leakage", "x_split_quarantine",
    // persisted ingest-time indexes (LSH / phash / audio-fp / BM25 /
    // Bloom blocklist)
    "x_incremental_embed_precision", "x_incremental_phash",
    "x_incremental_audio_fp", "x_bm25_topk_indexed", "x_url_blocklist",
    // write-once interchange artifacts
    "x_jsonl_roundtrip", "x_orc_roundtrip", "x_csv_roundtrip",
    // capstones over persisted prefix artifacts (deduped survivor set /
    // span-scrubbed prefix / crawl-extract)
    "x_pipeline_corpus_v3", "x_pipeline_corpus_v3_precision",
    "x_pipeline_corpus_v4", "x_pipeline_corpus_v5", "x_pipeline_corpus_v6",
    // train-once unigram vocab + emissions artifact
    "x_unigram_tokenizer", "x_unigram_encode",
    // ANN family (r17 verdict #1): the IVF-PQ queries share a
    // train-once codebook (in-process, source-identity-keyed) and a
    // persisted PQ-codes parquet artifact — in a cold session,
    // whichever family member runs first pays the Lloyd fit + corpus
    // encode. The LSH pair carries no persisted artifact; its cold
    // first pass is the family's first-touch expression-compile at the
    // measured SF (the sf0.001 warmup compiles different AQE shapes),
    // which measures as pass1-work with byte-identical fingerprints —
    // also caught by the env-churn reclassification, declared here so
    // the subtraction never depends on which guard fires first.
    "x_ann_ivfpq", "x_ann_ivfpq_precision",
    "x_ann_ivfpq_refined", "x_ann_ivfpq_refined_precision",
    "x_ann_lsh", "x_ann_lsh_precision")
}
