package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** R19 verdict #2: isolate `x_minhash_lsh_precision` (the heaviest
  * single query in the r18 official artifact, 4.12 s / 13.6 s cold) at
  * 1×/3×/10× of sf0.1 in the ProbeR16Capstone regime — fresh JVM per
  * mult, cold everything — extending ProbeR15d's 3× certification to
  * 10×. Reports wall, process CPU, verified output pairs, AND the LSH
  * band-candidate count (the scale-killer would be super-linear
  * candidate growth; the r15d finding was selectivity flat at 0.9 %).
  *
  * Replication scheme (same as ProbeR15d): mult disjoint copies of the
  * sf0.1 documents, copy i>0 with every token prefixed `c<i>` so
  * near-dup pairs never straddle copies — output must scale linearly
  * in mult, candidates near-linearly (band collisions across copies
  * are hash accidents only).
  *
  * Usage: sbt "Test/runMain graft.ProbeR19Minhash <mult>"
  */
object ProbeR19Minhash {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 1
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map { i =>
      val text = if (i > 0) regexp_replace(col("text"), "\\b(\\p{Alnum})", s"c$i$$1") else col("text")
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), text.as("text"))
    }.reduce(_ union _)

    val t0 = System.nanoTime()
    val c0 = osBean.getProcessCpuTime
    val rows = Dedup.minhashLshPrecisionUnion(docs, "doc_id", col("text"), 3, 64, 16, 0.8).count()
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9

    // candidate volume in a separate timed step (not part of the query
    // wall): the LSH band-collision pair set that verification consumes
    val t1 = System.nanoTime()
    val candidates = Dedup.minhashLshPairs(docs, "doc_id", col("text"), 3, 64, 16).count()
    val candWall = (System.nanoTime() - t1) / 1e9

    println(f"PROBE_R19_MINHASH mult=$mult docs=${n * mult} wall=$wall%.2f cpu=$cpu%.1f " +
      f"pairs=$rows candidates=$candidates cand_wall=$candWall%.2f")
    spark.stop()
  }
}
