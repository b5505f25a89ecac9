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
    val candidates = seeds.map { seed =>
      val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
        lshBucket(col(vec), numPlanes, dim, seed).as("bucket"))
      val exact = lshBucket(col(vec), numPlanes, dim, seed)
      val probes =
        if (!multiProbe) array(exact)
        else array(exact +: (0 until numPlanes).map(i =>
          exact.bitwiseXOR(lit(1L << i))): _*)
      val q = broadcast(queries
        .select(col(id).as("query_id"), col(vec).as("qv"), explode(probes).as("bucket")))
      c.join(q, Seq("bucket")).filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
    }.reduce(_.unionByName(_)).dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    candidates.withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }
}
