package graft
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev probe: ANN containment margin at a given SF — max exact rank of
  * any approximate neighbor (must stay well under the oracle's
  * k' = [[graft.queries.OpsQueries.AnnOracleKPrime]]).
  */
object ProbePrecision {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1000)
    val idx = Similarity.trainIvfPqIndex(emb, "vec_id", "embedding")
    for ((nm, approx) <- Seq(
        "lsh" -> Similarity.lshTopK(emb, q, "vec_id", "embedding", 5),
        "ivf" -> Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5),
        "ivfpq" -> Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5, index = Some(idx)),
        "ivfpq_refined" -> Similarity.ivfPqTopKRefined(emb, q, "vec_id", "embedding", 5, index = Some(idx)))) {
      val joined = approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left")
      val worst = joined.agg(max(col("rnk")), count(lit(1)), count(col("rnk"))).collect()(0)
      println(s"PROBE $nm maxExactRank=${worst.get(0)} nApprox=${worst.getLong(1)} nMatched=${worst.getLong(2)}")
    }
    spark.stop()
  }
}
