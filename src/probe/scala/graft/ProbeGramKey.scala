package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: A/B the PPJoin self-join key — xxhash64(gram) (8-byte
  * shuffle rows) vs the raw gram string — at sf0.1 and on the synthetic
  * `mult`× dup-heavy corpus where the shuffle actually dominates.
  * Adjudicates the r03 x_ngram_jaccard regression (commit 4707fd0);
  * numbers recorded in PLANS.md. Not part of the driver contract.
  * Usage: runMain graft.ProbeGramKey [mult]
  */
object ProbeGramKey {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val big = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text"), col("source")))
      .reduce(_ union _)

    def jaccard(docs: org.apache.spark.sql.DataFrame, hashed: Boolean) = {
      val grams = Dedup.docGramArrays(docs, "doc_id", col("text"), 3)
      Dedup.verifyJaccard(
        Dedup.ppjoinCandidates(grams, 0.8, maxDocFreq = 0L, hashGramKeys = hashed),
        grams, 0.8)
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE_GRAMKEY $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // warm both shapes (codegen/JIT) on the smallest SF
    val tiny = Tables.documents(spark, "/root/testdata/sf0.001")
    jaccard(tiny, hashed = true).count()
    jaccard(tiny, hashed = false).count()
    // interleave 2 reps of each so JIT/page-cache drift can't favor a side
    (1 to 2).foreach { rep =>
      time(s"sf0.1_hashed_r$rep")(jaccard(base, hashed = true).count())
      time(s"sf0.1_string_r$rep")(jaccard(base, hashed = false).count())
    }
    (1 to 2).foreach { rep =>
      time(s"x${mult}_hashed_r$rep")(jaccard(big, hashed = true).count())
      time(s"x${mult}_string_r$rep")(jaccard(big, hashed = false).count())
    }
    spark.stop()
  }
}
