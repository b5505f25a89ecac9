package graft

import org.apache.spark.sql.functions._

/** Dev probe: break x_minhash_lsh into stages and time each. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val docs = Tables.documents(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("count")(docs.count())
    time("grams")(docs.select(explode(array_distinct(
      graft.ops.TextAnalysis.wordNgrams(col("text"), 3)))).count())
    val sig = graft.ops.Dedup.minhashSignature(col("text"), 3, 64)
    time("signatures")(docs.select(col("doc_id"), sig.as("sig")).count())
    time("signatures_agg")(docs.select(col("doc_id"), sig.as("sig"))
      .select(sum(col("sig").getItem(0))).count())
    val pairs = graft.ops.Dedup.minhashLshPairs(docs, "doc_id", col("text"))
    time("full_pairs")(pairs.count())
    spark.stop()
  }
}
