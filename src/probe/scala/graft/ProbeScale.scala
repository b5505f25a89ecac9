package graft
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Dev probe: run the heaviest dedup/ANN shapes on a synthetic 10×
  * corpus (sf0.1 unioned with id-shifted copies) to watch how the
  * plans scale past the bench SF. Not part of the driver contract.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    // optional stage filter: runMain graft.ProbeScale 30 stageA stageB
    val only: Set[String] = args.drop(1).toSet
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text"), col("source")))
      .reduce(_ union _)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val nv = emb.count()
    val vecs = (0 until mult).map(i =>
      emb.select((col("vec_id") + lit(i * nv)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    def timeAlways(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE_SCALE $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.contains(name)) timeAlways(name)(f)
    println(s"PROBE_SCALE corpus docs=${n * mult} vecs=${nv * mult}")
    time("ngram_jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", col("text"), 3, 0.8).count())
    time("minhash_lsh_precision")(
      Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text")).count())
    time("simhash_pairs")(
      Dedup.simhashPairs(docs, "doc_id", col("text"), 8).count())
    time("decontamination")(
      Dedup.contaminationHits(
        docs.filter(col("source") =!= "src0"), "doc_id", col("text"),
        docs.filter(col("source") === "src0"), col("text"), 3).count())
    time("decontamination_bloom")(
      Dedup.contaminationHitsBloom(
        docs.filter(col("source") =!= "src0"), "doc_id", col("text"),
        docs.filter(col("source") === "src0"), col("text"), 3).count())
    // incremental admission of one sf0.1 batch against the other
    // mult-1 copies: EVERY batch doc collides with mult-1 corpus twins —
    // worst-case collision rate; cost must track batch-side work, with
    // the corpus touched only through its bucket index and the
    // colliding-doc semi-join
    time("incremental_near_dup")(
      Dedup.incrementalNearDupPairs(
        docs.filter(col("doc_id") >= n), docs.filter(col("doc_id") < n),
        "doc_id", col("text")).count())
    // the same admission against a PERSISTED plain-parquet index (the
    // layout the CLI writes): the build is the once-per-corpus ingest
    // cost; the admission must then skip every corpus-side minhash and
    // stream the index through the broadcast key probe — at mult× the
    // gap between the live and indexed runs is what the artifact buys
    if (only.isEmpty || only.contains("incremental_indexed")) {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-lshidx").toString
      try {
        timeAlways("lsh_index_build") {
          Dedup.buildLshIndex(docs.filter(col("doc_id") >= n), "doc_id", col("text"))
            .write.mode("overwrite").parquet(idxDir)
          spark.read.parquet(idxDir).count()
        }
        timeAlways("incremental_near_dup_indexed")(
          Dedup.incrementalNearDupPairs(
            docs.filter(col("doc_id") >= n), docs.filter(col("doc_id") < n),
            "doc_id", col("text"),
            corpusIndex = Some(spark.read.parquet(idxDir))).count())
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    }
    // the O(batch) claim isolated: a batch with NO corpus collisions
    // (token-reversed text → disjoint gram space) admitted against a
    // mult×-corpus index. Run at two mults: the cost must stay ~flat
    // as the corpus grows — the probe's broadcast key filter touches
    // only index rows whose buckets the batch actually has, and a
    // fresh batch has (almost) none.
    if (only.isEmpty || only.contains("incremental_fresh")) {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-freshidx").toString
      try {
        val corpus = docs.filter(col("doc_id") >= n)
        Dedup.buildLshIndex(corpus, "doc_id", col("text"))
          .write.mode("overwrite").parquet(idxDir)
        val freshBatch = docs.filter(col("doc_id") < n)
          .select(col("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
        timeAlways("incremental_fresh_indexed")(
          Dedup.incrementalNearDupPairs(
            corpus.select(col("doc_id"), col("text")), freshBatch,
            "doc_id", col("text"),
            corpusIndex = Some(spark.read.parquet(idxDir))).count())
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    }
    // the dup-heavy worst case for clustering: every doc sits in a
    // mult-sized clique, so components are MANY and label propagation
    // must converge in ~1 round despite ~100× pair volume
    time("near_dup_clusters")(
      Dedup.nearDupClusters(
        Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text"))).count())
    // worst-case span scrub: every 8-gram occurs `mult` times (the
    // id-shifted copies), so the dup verdict covers the ENTIRE gram set
    // and every doc is rewritten — maximal join-back and coverage work.
    // Aggregate n_removed rather than count(): the scrub's left join is
    // row-preserving, so a bare count() lets Catalyst eliminate the
    // join and times only the token scan (measured 0.55 s — a probe
    // artifact, not the operator).
    time("exact_substr_scrub")(
      Dedup.exactSubstrScrub(docs, "doc_id", col("text"))
        .agg(sum(col("n_removed"))).collect().head.getLong(0))
    // incremental embed admission under the same worst case as the text
    // path above: every batch vector collides with its mult-1 twins
    time("incremental_embed")(
      Similarity.incrementalCosinePairs(
        vecs.filter(col("vec_id") >= nv), vecs.filter(col("vec_id") < nv),
        "vec_id", "embedding", 0.3).count())
    time("embed_near_dup_lsh")(
      Similarity.cosineNearDupPairsLsh(vecs, "vec_id", "embedding", 0.3).count())
    time("ann_lsh")(
      Similarity.lshTopK(vecs, vecs.filter(pmod(col("vec_id"), lit(1000)) === 0),
        "vec_id", "embedding", 5).count())
    // IVF-PQ at mult×, split the production lifecycle: ENCODE is the
    // once-per-corpus ingest cost (per-row m·k distance tables — must
    // stay ~linear in the corpus); SEARCH runs against the persisted
    // codes artifact and must stay candidate-bound (codes join + the
    // broadcast-shortlist vector fetch, no vector shuffle)
    if (only.isEmpty || only.contains("ann_ivfpq_refined")) {
      val idx = Similarity.trainIvfPqIndex(vecs, "vec_id", "embedding")
      val codesDir = java.nio.file.Files.createTempDirectory("graft-probe-pq").toString
      try {
        timeAlways("ann_ivfpq_encode") {
          Similarity.encodePqCorpus(vecs, "vec_id", "embedding", idx)
            .write.mode("overwrite").parquet(codesDir)
          spark.read.parquet(codesDir).count()
        }
        timeAlways("ann_ivfpq_refined_search")(
          Similarity.ivfPqTopKRefined(vecs,
            vecs.filter(pmod(col("vec_id"), lit(1000)) === 0),
            "vec_id", "embedding", 5, index = Some(idx),
            encoded = Some(spark.read.parquet(codesDir))).count())
      } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(codesDir))
    }
    // chunking blows output up by ~(window/stride)× the token count —
    // pure narrow explode, cost must be output-bound. Aggregate the
    // token sum to force full chunk materialization (a bare count()
    // could skip the slice work).
    time("chunk_documents")(
      graft.ops.Sampling.chunkTokens(docs, col("doc_id"), col("text"), 64, 48)
        .agg(sum(col("n_chunk_tokens"))).collect().head.getLong(0))
    // line dedup at mult×: every structured line occurs `mult` times
    // (id-shifted copies do not change text), so EVERY line crosses the
    // hot threshold and every doc rebuilds to empty — maximal anti-join
    // and rebuild work; sum survivors to force the rebuild
    // as-of join at mult×: events replicated with shifted users AND a
    // shifted clock per copy; per-key history stays events-per-user
    // sized, so the one key shuffle + carry-forward window must scale
    // linearly in total events
    time("asof_join") {
      val ev0 = Tables.events(spark, "/root/testdata/sf0.1")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val ne = ev0.count()
      val ev = (0 until mult).map(i =>
        ev0.select((col("event_id") + lit(i * ne)).as("event_id"),
          // shift PAST the full user-id range (0..1499 at sf0.1) so
          // copies never collide on a key and per-key history stays
          // one user's events
          (col("user_id") + lit(i * 10000)).as("user_id"), col("ts"), col("event_type")))
        .reduce(_ union _)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.ops.Joins.asofJoin(purchases, views, "user_id", "ts",
        Seq("view_event_id")).count()
    }
    // token-budget curation at mult×: quality+token exprs are narrow,
    // the only exchanges are the per-mille stats agg and the selection
    // join — must stay linear in the corpus (budget scales with mult so
    // the boundary per-mille path stays active, not take-all/take-none)
    time("budget_select")(
      graft.ops.Sampling.budgetSelect(docs, col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")),
        graft.ops.TextAnalysis.tokenCount(col("text")),
        budgetTokens = 2000L * mult).count())
    // the capstone-shaped chain end to end at mult× (v4 live form, no
    // artifact): scrub → gate → span decontamination → LSH cluster
    // dedup → temperature mix → budget curation → chunk. The id-shifted
    // copies make every doc a mult-clique near-dup worst case for the
    // cluster stage; the terminal agg forces full chunk materialization
    time("pipeline_corpus") {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val scrubbed = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), graft.ops.TextAnalysis.scrubPii(col("text")).as("text"))
      val gated = scrubbed.filter(graft.ops.TextAnalysis.gopherPass(col("text"))).persist(lvl)
      val bench = docs.filter(col("source") === "src0")
      val desp = Dedup.decontaminationScrub(
          gated, "doc_id", col("text"), bench, col("text"), 3)
        .select(col("doc").as("doc_id"), col("scrubbed").as("text")).persist(lvl)
      try {
        val dropList = Dedup.clusterDropList(Dedup.nearDupClusters(
          Dedup.minhashLshExactPairs(desp, "doc_id", col("text"), 3, 64, 16, 0.8)))
        val deduped = desp.join(dropList, Seq("doc_id"), "left_anti")
        val mixed = graft.ops.Sampling.temperatureMixture(
            deduped.withColumn("lang_guess", graft.ops.TextAnalysis.langId(col("text"))),
            col("doc_id"), col("lang_guess"), 0.5)
          .select(col("doc_id"), col("text")).persist(lvl)
        try {
          val selected = graft.ops.Sampling.budgetSelect(mixed, col("doc_id"),
            graft.ops.TextAnalysis.qualityScore(col("text")),
            graft.ops.TextAnalysis.tokenCount(col("text")), 2000L * mult)
          val curated = mixed.join(selected.select(col("doc_id")), Seq("doc_id"))
          graft.ops.Sampling.chunkTokens(curated, col("doc_id"), col("text"), 64, 48)
            .agg(sum(col("n_chunk_tokens"))).collect().head.getLong(0)
        } finally mixed.unpersist()
      } finally { desp.unpersist(); gated.unpersist() }
    }
    // epoch mixing at mult×: a skinny stratum agg + broadcast rate join
    // + bounded narrow explode — cost must track the corpus scan plus
    // the (share-determined) output volume, never a corpus shuffle
    time("epoch_mixture")(
      graft.ops.Sampling.epochMixture(
        docs.withColumn("lang", graft.ops.TextAnalysis.langId(col("text"))),
        col("doc_id"), col("lang"), Map("en" -> 0.5, "und" -> 0.5)).count())
    // global rank at mult×: one range shuffle + a narrow local index;
    // the only driver state is the ≤P-row offset table, so cost must
    // stay linear in the corpus (forcing max(rank) materializes every
    // row's rank through the broadcast offset join)
    time("global_rank")(
      graft.ops.Sampling.globalRank(
        docs.select(col("doc_id"),
          graft.ops.TextAnalysis.qualityScore(col("text")).as("q")),
        Seq(col("q").desc, col("doc_id").asc))
        .agg(max(col("rank"))).collect().head.getLong(0))
    // bm25 at mult×: dl is a narrow expression, only query-term hits
    // cross the tf exchange — cost must track the corpus scan, not the
    // vocabulary
    time("bm25_topk")(
      graft.ops.Vocab.bm25TopK(docs, "doc_id", col("text"),
        graft.queries.OpsQueries.Bm25QueryTerms, 20).count())
    // DSIR at mult×: the fit is two corpus passes partial-aggregating
    // to ≤buckets rows (driver sees only the bucket table), scoring is
    // a narrow HOF over the broadcast model, selection a distributed
    // top-k — cost must stay linear in the corpus with no new shuffle
    // as mult grows. Target = the src0 slice (grows with mult too).
    time("dsir_select")(
      graft.ops.Selection.dsirSelect(docs,
        docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
        k = 100 * mult, buckets = 4096).count())
    // CCNet terciles at mult×: the window runs over the skinny
    // (doc, lang, ppl) projection after the LM fit's vocab-sized aggs
    time("perplexity_buckets")(
      graft.ops.Vocab.perplexityBuckets(docs, "doc_id", col("text"),
        graft.ops.TextAnalysis.langId(col("text"))).count())
    // UniMax manifest at mult×: waterfill over the ≤strata count table,
    // then the same broadcast-rate narrow explode as epoch mixing
    time("unimax_manifest")(
      graft.ops.Sampling.uniMaxManifest(
        docs.withColumn("lang", graft.ops.TextAnalysis.langId(col("text"))),
        col("doc_id"), col("lang"),
        graft.ops.TextAnalysis.tokenCount(col("text")), 0.9, 2.0).count())
    // D4 diversification at mult×: centroid training is the bounded
    // driver sample; the corpus pays one narrow assignment pass plus
    // one skinny (doc, cell, sim) window shuffle — linear, no vector
    // ever crossing an exchange (plan-pinned in OpsSpec)
    time("diversify")(
      graft.ops.Similarity.diversify(vecs, "vec_id", "embedding", 0.25,
        nCentroids = 64, sampleMod = 1).filter(col("action") === "kept").count())
    time("line_dedup") {
      val t = split(lower(trim(col("text"))), "\\s+")
      val lineArr = transform(sequence(lit(0), size(t) - 1, lit(10)),
        i => concat_ws(" ", slice(t, i + 1, lit(10))))
      val lined = concat_ws("\n", lineArr)
      Dedup.lineDedup(docs.select(col("doc_id"), lined.as("text")),
          "doc_id", col("text"), minDocFreq = mult)
        .agg(sum(col("n_lines_kept"))).collect().head.getLong(0)
    }
    spark.stop()
  }
}
