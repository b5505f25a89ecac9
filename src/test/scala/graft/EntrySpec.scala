package graft

/** Driver-contract consistency: the things the harness assumes but
  * nothing else checks.
  */
class EntrySpec extends SparkSpec {

  test("every oracle key has a query, and pack keys never collide") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    val orphaned = o.keySet.diff(q.keySet)
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
    // Map ++ silently shadows duplicate keys across packs — a collision
    // would make one pack's query run against another's oracle
    val packs = Seq(
      graft.queries.CoreQueries.queries, graft.queries.TransformQueries.queries,
      graft.queries.SubsetQueries.queries, graft.queries.IngestQueries.queries,
      graft.queries.OpsQueries.queries, graft.queries.PipelineQueries.queries,
      graft.queries.StoreQueries.queries, graft.queries.EventQueries.queries)
    assert(packs.map(_.size).sum == q.size, "duplicate query keys across packs")
  }

  test("flagship entry returns rows on the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Round 10 lost 5 queries from the CORRECTNESS artifact silently when
  // testdata schema drift made them fail analysis — the harness dropped
  // them instead of reporting errors. Pin the declared-query count and
  // force every query through analysis against the LIVE testdata so a
  // schema drift fails loudly here, not invisibly in the artifact.
  test("declared query count is pinned") {
    assert(SparkEntry.queries.size == EntrySpec.DeclaredQueries,
      s"query count changed (${SparkEntry.queries.size}); update EntrySpec.DeclaredQueries deliberately")
  }

  test("every declared query analyzes against the live testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, sfDir).queryExecution.analyzed; None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"queries failing analysis on $sfDir:\n${failures.mkString("\n")}")
  }
}

object EntrySpec {
  /** Bump deliberately when adding/removing queries. */
  // r14: +x_warc_ingest, +x_quality_logit_trained (r13 tail),
  // +x_unigram_tokenizer, +x_unigram_encode, +x_media_phash,
  // +x_media_phash_dedup, +x_incremental_phash, +x_pipeline_corpus_v6,
  // +x_pagerank, +x_media_audio_fp, +x_media_audio_fp_dedup,
  // +x_doremi_weights, +x_doremi_mix, +x_orc_roundtrip, +x_csv_roundtrip,
  // +x_url_blocklist, +x_incremental_audio_fp, +x_keyword_filter
  val DeclaredQueries = 172 // r16: +x_compression_bound (deflate containment oracle)
}
