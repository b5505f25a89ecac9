package graft
import org.apache.spark.sql.functions._

/** r16 probe (verdict #4): scale-certify the capstone pipelines the way
  * the dedup family was probed in r15 — the composed YAML-equivalent
  * plans `x_pipeline_corpus` (v1) and `x_pipeline_corpus_v2`, isolated
  * in a fresh JVM, on a mult× corpus in the DISJOINT regime (each copy's
  * tokens are prefix-mutated so near-dup structure does not grow
  * cross-copy — the realistic shape where corpus growth adds new
  * content, not more duplicates of old content).
  *
  * Usage: sbt "Test/runMain graft.ProbeR16Capstone <query> <mult>"
  * The scaled corpus is WRITTEN to parquet first (outside the timed
  * window) so the measured plan reads a real file scan like the bench.
  */
object ProbeR16Capstone {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "x_pipeline_corpus_v2"
    val mult = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    // Copy i permutes each doc's words by a copy-keyed hash order. This
    // preserves every Gopher-gate statistic (same word multiset → same
    // word count, mean word length, alpha/stopword ratios), so the gate
    // admits every copy — unlike a token-prefix mutation, which fails
    // the mean-word-length/stopword rules and silently shrinks the
    // probe back to 1×. Word 3-gram sets are ~disjoint across copies
    // (different permutations), so near-dup structure stays per-copy:
    // the disjoint regime, where growth adds content, not duplicates.
    // Copy i suffixes every NON-stopword word with a copy tag. Survives
    // every Gopher rule (stopword hits unchanged, mean word length +2
    // stays inside [3,10], counts/ratios identical) and keeps each
    // copy's n-gram structure isomorphic to the original — so gating,
    // contamination, and near-dup behavior replicate per copy while
    // content grams stay DISJOINT across copies (all-stopword 3-grams
    // are the only shared ones). Two rejected designs, for the record:
    // token-PREFIX mutation fails the mean-word-length/stopword gates
    // (copies vanish at the gate), and hash-order word permutation
    // either clusters equal words (fails the repetition gate) or — on
    // this tiny-vocabulary synthetic corpus — turns 3-grams into a
    // dense random soup whose bench overlap marks ~everything
    // contaminated (0 survivors).
    val stopArr = array(graft.ops.TextAnalysis.RequiredStopwords.map(lit): _*)
    val docs = (0 until mult).map { i =>
      val text =
        if (i == 0) col("text")
        else array_join(transform(split(trim(col("text")), "\\s+"),
          w => when(array_contains(stopArr, lower(w)), w)
            .otherwise(concat(w, lit(s"c$i")))), " ")
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-cap-$mult-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // v3+ capstones would also need embeddings; v1/v2 read documents only
    val t0 = System.nanoTime(); val c0 = cpu()
    val rows = SparkEntry.queries(name)(spark, dir.toString).count()
    println(f"PROBE_R16CAP $name mult=$mult rows=$rows " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${cpu() - c0}%.1f")
    spark.stop()
  }

  private def cpu(): Double = java.lang.management.ManagementFactory
    .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    .getProcessCpuTime / 1e9
}
