package graft
import org.apache.spark.sql.functions._
import graft.ops.{DomainReweight, LinkGraph, Multimodal, NetpbmWavCodec}

/** Dev probe: the round-14 operators on a synthetic mult× sf0.1
  * corpus (id-shifted copies, the ProbeScale convention) — PageRank
  * power iteration, DoReMi stats + EG rounds, acoustic
  * fingerprinting, and banded phash admission at worst-case collision
  * rate (every batch doc has mult−1 corpus twins). Not part of the
  * driver contract; results recorded in PLANS.md.
  */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 10
    val only: Set[String] = args.drop(1).toSet
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val n = base.count()
    val docs = (0 until mult).map(i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"), col("text"), col("source")))
      .reduce(_ union _)
    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.contains(name)) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"PROBE_R14 $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    println(s"PROBE_R14 mult=$mult docs=${n * mult}")
    val ids = docs.select(col("doc_id").as("id"))
    val total = n * mult
    val edges = ids.select(col("id").as("src"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
      .select(col("src"), ((col("src") * 31 + col("k")) % lit(total)).as("dst"))
    time("pagerank_5")(LinkGraph.pageRank(ids, edges, 5).count())
    time("doremi_weights")(
      DomainReweight.doremiWeights(docs, col("source"), col("text")).count())
    val mk: () => graft.ops.MediaCodec = () => new NetpbmWavCodec()
    time("audio_fp")(Multimodal.audioFingerprint(
      Multimodal.packWav(docs, col("doc_id"), col("text")), codec = mk).count())
    val corpusH = Multimodal.perceptualHash(
      Multimodal.packPnm(docs.filter(col("doc_id") >= n), col("doc_id"), col("text")),
      codec = mk)
    val batchH = Multimodal.perceptualHash(
      Multimodal.packPnm(docs.filter(col("doc_id") < n), col("doc_id"), col("text")),
      codec = mk)
    time("incremental_phash")(Multimodal.incrementalPhashPairs(
      Multimodal.buildPhashIndex(corpusH), batchH).count())
    spark.stop()
  }
}
