package graft
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev probe (r10 verdict #1c): semantic dedup at scale multiples of
  * sf0.1's embeddings — cost must track EMITTED PAIRS (every vector
  * gains mult-1 exact twins, so true pairs grow ~mult²), not N²/k.
  * Also exercises the large-k broadcast assignment path and asserts
  * sharding stays recall-lossless at scale.
  * Usage: runMain graft.ProbeSemantic [mult]
  */
object ProbeSemantic {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toInt else 30
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val nv = base.count()
    val vecs = (0 until mult).map(i =>
      base.select((col("vec_id") + lit(i * nv)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    println(s"PROBE_SEMANTIC corpus vecs=${nv * mult}")
    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE_SEMANTIC $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      rows
    }
    // auto-k (narrow or broadcast path depending on N/1024)
    time("semdedup_auto_k")(
      Similarity.semanticDedupPairs(vecs, "vec_id", "embedding", 0.3).count())
    // forced large-k: broadcast centroid-table assignment
    val big = time("semdedup_k256_bcast")(
      Similarity.semanticDedupPairs(vecs, "vec_id", "embedding", 0.3,
        nCentroids = 256).count())
    // same k with aggressive cell cap: sharded block joins, SAME pairs
    val shard = time("semdedup_k256_cap512")(
      Similarity.semanticDedupPairs(vecs, "vec_id", "embedding", 0.3,
        nCentroids = 256, maxCellSize = 512).count())
    assert(shard == big, s"sharding changed pair count: $shard != $big")
    println("PROBE_SEMANTIC sharding lossless at scale: OK")
    spark.stop()
  }
}
