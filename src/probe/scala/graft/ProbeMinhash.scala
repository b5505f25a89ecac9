package graft

import org.apache.spark.sql.functions._

/** Dev probe: break the MinHash-LSH family into stages and time/count
  * each — candidate volumes (band vs PPJoin) are the scale lever for
  * `x_minhash_lsh_precision` (see VERDICT r6: 70 s, 49% of the bench).
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val docs = Tables.documents(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label -> $r (${(System.nanoTime() - t0) / 1e9}%.2f s)")
      r
    }
    import graft.ops.Dedup
    time("docs")(docs.count())
    val grams = Dedup.docGramArrays(docs, "doc_id", col("text"), 3)
    time("gram_arrays")(grams.count())
    val sigs = Dedup.minhashSigs(docs, "doc_id", col("text"), 3, 64)
    time("signatures")(sigs.count())
    val band = Dedup.bandCandidates(sigs, 64, 16)
    time("band_candidates")(band.count())
    val pp = Dedup.ppjoinCandidates(grams, 0.8, maxDocFreq = 0L)
    time("ppjoin_candidates")(pp.count())
    time("union_candidates")(band.union(pp).count())
    time("verify_band_only")(Dedup.verifyJaccard(band, grams, 0.8).count())
    time("precision_union_full")(
      Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text"), 3, 64, 16, 0.8).count())
    spark.stop()
  }
}
