package graft
import org.apache.spark.sql.functions._

/** r18 probe (r17 verdict #3): scale-certify `x_pipeline_corpus_v3_precision`,
  * the one >3 s query without its own 1×/3×/10× row.
  *
  * Regime: the DOCUMENTS side replicates mult× in the disjoint regime
  * (the ProbeR16Capstone suffix mutation — near-dup/gate/contamination
  * structure replicates per copy, content grams disjoint across
  * copies), while the EMBEDDINGS table is copied through at 1×
  * UNCHANGED. Replicated doc_ids carry no vectors, so they skip the
  * semantic stage by v3's own contract ("docs without an embedding
  * survive on the textual verdict alone", OpsQueries pipelineV3Parts:
  * docVecs is an inner join) — the realistic
  * embeddings-cover-a-subset regime. This is DELIBERATE: the r17
  * PLANS.md adjudication stands — the synthetic embeddings admit no
  * honest disjoint-regime mutation (every norm-preserving transform
  * leaves cross-copy cosines random-pair-distributed, and the
  * corpus-forced 0.3 threshold admits random pairs, so a mult×
  * embedding replication measures a quadratic testdata artifact, not
  * the operator). The semantic stage's own scale posture is certified
  * by plan pins (landmark bucketing, vectors never cross an exchange,
  * PlanSpec); what THIS probe certifies is everything the semantic
  * stage composes with: the cold dedupedArtifact chain (gate →
  * decontamination → PPJoin near-dup → CC) at mult×, the
  * survivors×vectors join, the exact-union verifier, and the
  * mix/pack tail.
  *
  * Usage: sbt "Test/runMain graft.ProbeR18V3 <mult>"
  * Corpus written to parquet outside the timed window; artifacts COLD
  * (fresh tmp dir ⇒ fresh ArtifactCache identity).
  */
object ProbeR18V3 {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 3
    val name = "x_pipeline_corpus_v3_precision"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val base = Tables.documents(spark, sf)
    val n = base.count()
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
    val dir = java.nio.file.Files.createTempDirectory(s"graft-probe-v3p-$mult-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings at 1×, verbatim — copy-0 doc_ids keep their vectors,
    // replicated copies have none (see scaladoc)
    Tables.embeddings(spark, sf).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime(); val c0 = cpu()
    val rows = SparkEntry.queries(name)(spark, dir.toString).count()
    println(f"PROBE_R18V3 $name mult=$mult rows=$rows " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${cpu() - c0}%.1f")
    spark.stop()
  }

  private def cpu(): Double = java.lang.management.ManagementFactory
    .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    .getProcessCpuTime / 1e9
}
