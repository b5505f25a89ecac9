package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis => TA}

/** r21 scaling artifact (VERDICT r20 #6): the sf0.1 bench measures the
  * per-query session floor (8-core total ≈ 32-core total, median ratio
  * 1.10), so it cannot demonstrate parallel scaling. This probe runs a
  * COMPUTE-DOMINATED stage set over the synthetic 10× corpus (sf0.1
  * unioned with id-shifted copies — multiple scan partitions, so the
  * work actually fans out) under whatever `SPARK_GRAFT_CPUS` the caller
  * sets, and appends one JSON line per invocation. Running it at 8 and
  * 32 cores gives the scaling table `BENCH_scale_r21.json` commits:
  * narrow compute stages should approach the core ratio; shuffle-heavy
  * stages show their §2.2 shuffle fraction.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCALE_OUT=BENCH_scale_r21.json \
  *     sbt "Test/runMain graft.ProbeR21Scale [mult]"
  */
object ProbeR21Scale {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_scale_r21.json")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text"), col("source")))
      .reduce(_ union _)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time(name: String)(f: => Long): Unit = {
      spark.sparkContext.setJobDescription(s"scale: $name")
      // warm once at 1× for plan/JIT, then measure at mult×
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = BigDecimal(sec).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      println(f"PROBE_SCALE21 $name cpus=$cpus rows=$rows sec=$sec%.2f")
      spark.sparkContext.setJobDescription(null)
    }
    // narrow compute stages (should track the core ratio): the capstone
    // regex prefix and the mixture/quality metric passes. These need
    // tens of CPU-seconds of uniform per-row work to rise above the
    // per-job floor, so the copy set is 24×mult (one narrow explode —
    // no giant union plan) spread across a FIXED 256 partitions so both
    // core counts schedule identical compute tasks
    val wideFactor = 24 * mult
    val docsWide = base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(wideFactor - 1))).as("c"))
      .select((col("doc_id") * wideFactor + col("c")).as("doc_id"), col("text"))
      .repartition(256).localCheckpoint(true)
    time("scrub_gate_narrow")(
      docsWide.filter(TA.gopherPass(TA.scrubPii(col("text")))).count())
    time("lang_quality_narrow")(
      docsWide.select(TA.langId(col("text")).as("l"),
          (TA.qualityScore(col("text")) * TA.tokenCount(col("text"))).as("w"))
        .groupBy(col("l")).agg(sum(col("w"))).count())
    // join/shuffle-carrying stages (show the §2.2 shuffle fraction)
    time("ngram_jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", col("text"), 3, 0.8, eager = true).count())
    time("minhash_lsh_precision")(
      Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text")).count())
    time("simhash_pairs")(
      Dedup.simhashPairs(docs, "doc_id", col("text"), 8).count())
    time("decontamination")(
      Dedup.contaminationHits(
        docs.filter(col("source") =!= "src0"), "doc_id", col("text"),
        docs.filter(col("source") === "src0"), col("text"), 3).count())
    val qjson = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"scale_probe","mult":$mult,"cpus":$cpus,"unit":"sec","docs":${n * mult},"queries":$qjson}"""
    Files.write(Paths.get(outPath), (line + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    println(line)
    spark.stop()
  }
}
