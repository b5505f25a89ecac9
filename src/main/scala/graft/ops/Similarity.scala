package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a production pipeline needs both:
  *   - `bruteForceTopK`: exact cosine top-k — broadcast the (small)
  *     query set against the corpus; the baseline and the verifier.
  *   - `lshTopK`: random-hyperplane LSH — signature bits via
  *     deterministic pseudo-random planes, bucket equi-join, exact
  *     re-rank inside buckets. The 100 TB path: candidate generation is
  *     a shuffle on bucket keys instead of a cross join.
  *
  * Dot products use the `zip_with`/`aggregate` higher-order functions —
  * codegen-friendly, no UDF, no driver involvement.
  */
object Similarity {

  /** Cosine similarity of two `array<float/double>` columns (computed in
    * double, sequential fold in index order). Dispatches to the native
    * codegen'd `CosineExpr` (registered via `GraftExtensions`);
    * `cosineHof` is the pure-HOF reference formulation it is
    * parity-tested against.
    */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (excluding self).
    * `queries` must be small enough to broadcast — it is the *query set*
    * (typically 1–10⁴ rows), not the corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val scored = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes: `planes × dim`
    * doubles seeded by (plane, dim) — same plan every run, so results
    * are reproducible and testable.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Bit-signature bucket id for a vector under deterministic planes —
    * native codegen'd `LshBucketExpr`, which derives the same
    * `Random(seed).nextGaussian` planes as [[hyperplanes]].
    */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long): Column =
    call_function("graft_lsh_bucket", vec, lit(numPlanes), lit(dim), lit(seed))

  /** Pure-HOF bucket formulation over explicit planes — the reference
    * the native expression is parity-tested against.
    */
  private[graft] def lshBucketHof(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, planeArr, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding-cosine near-duplicate pairs, exact: every (id_a < id_b)
    * pair with cosine >= threshold. Inherently quadratic — run it over a
    * bounded sample or partition (the verifier role); the full-corpus
    * path is [[cosineNearDupPairsLsh]]. The smaller side is broadcast,
    * so the corpus side streams through a nested-loop join without a
    * shuffle.
    *
    * `maxRows` is the verifier's contract, enforced: pointing this at a
    * corpus larger than the bound fails loudly BEFORE the broadcast
    * build instead of OOMing an executor. Raise it deliberately if a
    * bigger exact pass is really intended; the count that enforces it
    * is one distributed pass over a 1-column projection.
    */
  def cosineNearDupPairs(df: DataFrame, id: String, vec: String, threshold: Double,
                         maxRows: Long = 10000L): DataFrame = {
    // bounded probe, not a full count: LIMIT maxRows+1 stops the scan as
    // soon as the bound is provably violated, so the guard costs O(maxRows)
    // regardless of corpus size
    val probeLimit = (math.min(maxRows, Int.MaxValue - 1L) + 1L).toInt
    val n = df.select(col(id)).limit(probeLimit).count()
    require(n <= maxRows,
      s"cosineNearDupPairs is the exact quadratic verifier: input has more than maxRows=" +
        s"$maxRows rows. Use cosineNearDupPairsLsh for full corpora, or pass a larger " +
        "maxRows deliberately.")
    val l = df.select(col(id).as("id_a"), col(vec).as("va"))
    val r = df.select(col(id).as("id_b"), col(vec).as("vb"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Embedding-cosine near-duplicate pairs at scale: hyperplane-LSH
    * bucketing turns the all-pairs cross join into per-bucket
    * self-joins (an equi-join shuffle on bucket keys), then the exact
    * cosine filter keeps precision at 1.0 — only recall is approximate.
    * A pair at cosine c collides per table with probability
    * (1 - arccos(c)/π)^numPlanes, so recall rises with fewer planes /
    * more seeds; the defaults (4 planes × 4 tables) hold usable recall
    * down to c ≈ 0.3, while true near-dup thresholds (c ≥ 0.9) collide
    * at ≥ 77% per table.
    */
  def cosineNearDupPairsLsh(
      df: DataFrame,
      id: String,
      vec: String,
      threshold: Double,
      numPlanes: Int = 4,
      dim: Int = 64,
      seeds: Seq[Long] = Seq(42L, 43L, 44L, 45L)): DataFrame = {
    // All seeds ride ONE exchange: explode (seed, bucket) per vector and
    // self-join on the composite key — k seeds cost one shuffle, not k,
    // and the identical bucketed subplan on both sides is a
    // ReusedExchange.
    val seedBuckets = array(seeds.map(s =>
      struct(lit(s).as("seed"), lshBucket(col(vec), numPlanes, dim, s).as("bucket"))): _*)
    val b = df
      .select(col(id).as("doc"), col(vec).as("v"), explode(seedBuckets).as("sb"))
      .select(col("doc"), col("v"), col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .repartition(col("seed"), col("bucket"))
    // Order of operations matters at scale: the exact cosine runs
    // map-side straight off the join (no shuffle touches the vectors),
    // the threshold filter then drops almost every candidate, and only
    // the tiny survivor id-pairs pay the dedup shuffle.
    b.as("l").join(b.as("r"), Seq("seed", "bucket"))
      .filter(col("l.doc") < col("r.doc"))
      .filter(cosine(col("l.v"), col("r.v")) >= threshold)
      .select(col("l.doc").as("id_a"), col("r.doc").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Deterministic driver-side spherical k-means over a collected
    * sample: init = first k sample vectors (id order), `iters` Lloyd
    * rounds with cosine assignment and L2-normalized mean update.
    * Training data is a bounded sample (k·dim doubles of state); only
    * assignment runs distributed.
    */
  private[graft] def trainCentroids(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"need at least $k sample vectors, got ${sample.length}")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var centroids = sample.take(k).map(normalize)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Int](k)
      for (v <- sample) {
        val nv = normalize(v)
        val best = centroids.indices.maxBy(c => dot(centroids(c), nv))
        counts(best) += 1
        for (d <- 0 until dim) sums(best)(d) += nv(d)
      }
      centroids = centroids.indices.toArray.map { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }
    }
    centroids
  }

  /** Per-row similarity to each centroid as an array column. Uses the
    * native codegen'd cosine against each (unit-norm) centroid literal
    * instead of interpreted HOF lambdas over a k×dim literal array —
    * cosine against unit centroids orders identically to the dot
    * product (it only rescales by the row's own 1/|v|), so argmax cell
    * assignment and probe ranking are unchanged.
    */
  private def centroidSims(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => cosine(vec, typedLit(c.toSeq))): _*)

  /** Bounded deterministic centroid training from a corpus sample —
    * shared by [[ivfTopK]] and [[semanticDedupPairs]]: systematic
    * thinning for spread, ordered limit so the driver never holds more
    * than `maxTrainRows` vectors regardless of corpus size.
    */
  private def trainOnCorpus(corpus: DataFrame, id: String, vec: String,
                            nCentroids: Int, sampleMod: Int, iters: Int,
                            maxTrainRows: Int): Array[Array[Double]] = {
    val sample = corpus
      .filter(pmod(col(id), lit(sampleMod)) === 0)
      .orderBy(col(id))
      .limit(maxTrainRows)
      .select(col(vec))
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    trainCentroids(sample, nCentroids, iters)
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): k-means cells as the blocking structure, exact
    * cosine pairs above `threshold` WITHIN each cell. Precision is 1.0
    * by the exact filter (every emitted pair really is above
    * threshold); recall misses only pairs whose members land in
    * different cells — the paper's own trade, tuned by `nCentroids`.
    *
    * Scale shape: centroids are tiny driver state (bounded training,
    * same as IVF); assignment is a narrow argmax expression; the only
    * shuffle is the cell-keyed self-join, whose identical bucketed
    * subplan on both sides collapses to a ReusedExchange — the
    * k-means analog of [[cosineNearDupPairsLsh]], never all-pairs.
    */
  def semanticDedupPairs(
      df: DataFrame,
      id: String,
      vec: String,
      threshold: Double,
      nCentroids: Int = 16,
      sampleMod: Int = 10,
      iters: Int = 3,
      maxTrainRows: Int = 10000): DataFrame = {
    val centroids = trainOnCorpus(df, id, vec, nCentroids, sampleMod, iters, maxTrainRows)
    val sims = centroidSims(col(vec), centroids)
    val cell = (array_position(sims, array_max(sims)) - 1).cast("int")
    val assigned = df.select(col(id).as("doc"), col(vec).as("v"), cell.as("cell"))
      .repartition(col("cell"))
    assigned.as("l").join(assigned.as("r"), Seq("cell"))
      .filter(col("l.doc") < col("r.doc"))
      .filter(cosine(col("l.v"), col("r.v")) >= threshold)
      .select(col("l.doc").as("id_a"), col("r.doc").as("id_b"))
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned
    * to their nearest coarse centroid once; each query probes the
    * `nProbe` nearest centroid cells and exact cosine re-ranks inside
    * them. The scale shape: candidate generation is an equi-join on
    * cell ids, the centroid table is tiny driver state, and recall is
    * tuned by nProbe/nCentroids without touching the stored assignment.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      sampleMod: Int = 10,
      iters: Int = 3,
      maxTrainRows: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = trainOnCorpus(corpus, id, vec, nCentroids, sampleMod, iters, maxTrainRows)
    val sims = centroidSims(col(vec), centroids)
    // corpus: one cell per vector (argmax over centroid sims)
    val cell = (array_position(sims, array_max(sims)) - 1).cast("int")
    val assigned = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"), cell.as("cell"))
      .repartition(col("cell"))
    // queries: nProbe nearest cells, best first (sort (-sim, idx) structs)
    val ranked = array_sort(zip_with(sims, sequence(lit(0), lit(nCentroids - 1)),
      (s, i) => struct((-s).as("neg"), i.as("idx"))))
    val probes = transform(slice(ranked, 1, nProbe), x => x.getField("idx").cast("int"))
    val q = broadcast(queries
      .select(col(id).as("query_id"), col(vec).as("qv"), explode(probes).as("cell")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    assigned.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Approximate top-k: bucket by hyperplane signature, exact cosine
    * re-rank within buckets. Multi-probe: each query also probes the
    * buckets at Hamming distance ≤ 1 from its own (query-side explode
    * only — the corpus is bucketed exactly once per table). Recall
    * rises with fewer planes (bigger buckets), more seeds (more
    * tables), or probing; candidate fraction is the cost dial.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: String,
      vec: String,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      seeds: Seq[Long] = Seq(42L, 43L),
      multiProbe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Every seed rides one (seed, bucket)-keyed join: the corpus is
    // bucketed and exchanged ONCE for all tables, the (broadcast) query
    // side explodes seeds × probes.
    val corpusBuckets = array(seeds.map(s =>
      struct(lit(s).as("seed"), lshBucket(col(vec), numPlanes, dim, s).as("bucket"))): _*)
    val c = corpus
      .select(col(id).as("neighbor_id"), col(vec).as("cv"), explode(corpusBuckets).as("sb"))
      .select(col("neighbor_id"), col("cv"), col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
    val queryProbes = array(seeds.flatMap { s =>
      val exact = lshBucket(col(vec), numPlanes, dim, s)
      val probes =
        if (!multiProbe) Seq(exact)
        else exact +: (0 until numPlanes).map(i => exact.bitwiseXOR(lit(1L << i)))
      probes.map(p => struct(lit(s).as("seed"), p.as("bucket")))
    }: _*)
    val q = broadcast(queries
      .select(col(id).as("query_id"), col(vec).as("qv"), explode(queryProbes).as("sb"))
      .select(col("query_id"), col("qv"), col("sb.seed").as("seed"), col("sb.bucket").as("bucket")))
    // cosine runs map-side off the join; the dedup + rank shuffles then
    // move only (query, neighbor, sim) — never the vectors (dup pairs
    // from different seeds carry the same sim, so dedup keeping an
    // arbitrary row is exact)
    val candidates = c.join(q, Seq("seed", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }
}
