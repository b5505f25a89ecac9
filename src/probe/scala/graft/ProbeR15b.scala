package graft
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: isolate the 30× super-linearity seen in ProbeR15 —
  * lexical vs df-ordered prefixes, and salted-copy generation cost,
  * measured separately. Results in PLANS.md.
  */
object ProbeR15b {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 30
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val disjoint = (0 until mult).map { i =>
      val text = if (i > 0)
        regexp_replace(col("text"), "\\b(\\p{Alnum})", s"c$i$$1")
      else col("text")
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), text.as("text"))
    }.reduce(_ union _)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE_R15B $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    println(s"PROBE_R15B mult=$mult docs=${n * mult}")
    // cost of just materializing the salted corpus (regex + union)
    time("salt_materialize")(disjoint.count())
    // the gram-array build alone (shingle + sort + doc shuffle)
    time("gram_arrays")(
      Dedup.docGramArrays(disjoint, "doc_id", col("text"), 3).localCheckpoint(true).count())
    time("ngram_lexical")(
      Dedup.ngramJaccardPairs(disjoint, "doc_id", col("text"), 3, 0.8,
        eager = true).count())
    time("ngram_dforder")(
      Dedup.ngramJaccardPairs(disjoint, "doc_id", col("text"), 3, 0.8,
        eager = true, dfOrder = true).count())
    spark.stop()
  }
}
