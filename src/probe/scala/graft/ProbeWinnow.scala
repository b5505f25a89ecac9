package graft
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis => TA}

/** Dev probe: winnowing-print document-frequency distribution and the
  * pair fan-out of [[Dedup.winnowDupPairs]] with the skew guard off vs
  * df-quantile-derived caps, on the id-shifted mult× corpus (every doc
  * duplicated mult times — the dup-heavy worst case, where a cap below
  * the duplication factor would destroy true-dup recall). Backs the
  * choice of the query default; results recorded in PLANS.md.
  * Usage: runMain graft.ProbeWinnow [mult]
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 30
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text"), col("source")))
      .reduce(_ union _)
    println(s"PROBE_WINNOW corpus docs=${n * mult} (mult=$mult)")
    val prints = docs.select(col("doc_id").as("doc"),
      explode(TA.winnowFingerprints(col("text"), 4, 4)).as("print"))
    val df = prints.groupBy(col("print")).agg(count(lit(1)).as("df"))
      .localCheckpoint(true)
    val q = df.selectExpr(
      "count(1) as n_prints",
      "percentile(df, 0.5) as p50", "percentile(df, 0.9) as p90",
      "percentile(df, 0.99) as p99", "percentile(df, 0.999) as p999",
      "max(df) as max").collect()(0)
    println(s"PROBE_WINNOW df_dist $q")
    // pair fan-out per df bucket: a print with df d contributes d(d-1)/2
    // candidate pair rows — the quadratic bomb the cap defuses
    df.selectExpr("df", "df * (df - 1) / 2 as pairs")
      .groupBy((col("df") > mult * 4).as("above_4x_mult"))
      .agg(count(lit(1)).as("n_prints"), sum(col("pairs")).as("pair_rows"))
      .collect().foreach(r => println(s"PROBE_WINNOW fanout $r"))
    def time(name: String, maxDocFreq: Long): Long = {
      val t0 = System.nanoTime()
      val rows = Dedup.winnowDupPairs(docs, "doc_id", col("text"), 4, 4, 2, maxDocFreq).count()
      println(f"PROBE_WINNOW pairs maxDocFreq=$maxDocFreq rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      rows
    }
    val off = time("off", 0L)
    for (cap <- Seq(mult * 8L, mult * 4L, mult * 2L)) {
      val kept = time(s"cap$cap", cap)
      println(f"PROBE_WINNOW recall_vs_off cap=$cap ${kept.toDouble / off}%.4f")
    }
    spark.stop()
  }
}
