package graft
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe: minhashLshPrecisionUnion ALONE in a fresh JVM at mult×. */
object ProbeR15d {
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
    val t0 = System.nanoTime()
    val rows = Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text")).count()
    println(f"PROBE_R15D lsh_precision_isolated mult=$mult rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
