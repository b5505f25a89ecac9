package graft
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: decompose x_minhash_lsh_precision's 30× cost. */
object ProbeR15c {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 30
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map { i =>
      val text = if (i > 0) regexp_replace(col("text"), "\\b(\\p{Alnum})", s"c$i$$1") else col("text")
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), text.as("text"))
    }.reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"PROBE_R15C $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    println(s"PROBE_R15C mult=$mult docs=${n * mult}")
    time("minhash_sigs")(Dedup.minhashSigs(docs, "doc_id", col("text"), 3, 64).count())
    time("band_candidates")(Dedup.bandCandidates(
      Dedup.minhashSigs(docs, "doc_id", col("text"), 3, 64), 64, 16).count())
    val grams = Dedup.docGramArrays(docs, "doc_id", col("text"), 3).localCheckpoint(true)
    time("ppjoin_dforder")(Dedup.ppjoinCandidates(grams, 0.8, 0L, dfOrder = true).count())
    time("verify_union")(Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text")).count())
    spark.stop()
  }
}
