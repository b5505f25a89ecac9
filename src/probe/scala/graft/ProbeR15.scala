package graft
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: the PPJoin/LSH dedup family at 3×–10× sf0.1 (the r14
  * verdict's certification ask), in TWO regimes that isolate the two
  * things that can grow:
  *
  *   - `disjoint` — every copy's words carry a per-copy salt, so gram
  *     spaces are disjoint across copies: duplicate DENSITY stays
  *     constant while the corpus grows. Sub-linear-per-row time here
  *     certifies the candidate generation itself (prefix order, hot
  *     grams, banding) scales with corpus size.
  *   - `dense` — plain id-shifted copies: every doc gains mult−1
  *     identical twins, so the TRUE pair output grows ~mult² per
  *     group. Time tracking the OUTPUT (not corpus²) certifies the
  *     cost is collision-bound, the same contract the incremental
  *     admission probes pin.
  *
  * Not part of the driver contract; results recorded in PLANS.md.
  */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    val only: Set[String] = args.drop(1).toSet
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    def copies(salted: Boolean) = (0 until mult).map { i =>
      val text = if (salted && i > 0)
        regexp_replace(col("text"), "\\b(\\p{Alnum})", s"c$i$$1")
      else col("text")
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), text.as("text"))
    }.reduce(_ union _)
    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.contains(name)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"PROBE_R15 $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    println(s"PROBE_R15 mult=$mult docs=${n * mult}")
    val disjoint = copies(salted = true)
    val dense = copies(salted = false)
    time("ngram_jaccard_disjoint")(
      Dedup.ngramJaccardPairs(disjoint, "doc_id", col("text"), 3, 0.8,
        eager = true, dfOrder = true).count())
    time("lsh_precision_disjoint")(
      Dedup.minhashLshPrecisionUnion(disjoint, "doc_id", col("text")).count())
    time("clusters_disjoint")(
      Dedup.nearDupClusters(Dedup.ngramJaccardPairs(disjoint, "doc_id", col("text"), 3, 0.8,
        eager = true, dfOrder = true)).count())
    time("ngram_jaccard_dense")(
      Dedup.ngramJaccardPairs(dense, "doc_id", col("text"), 3, 0.8,
        eager = true, dfOrder = true).count())
    time("lsh_precision_dense")(
      Dedup.minhashLshPrecisionUnion(dense, "doc_id", col("text")).count())
    spark.stop()
  }
}
