package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: deterministic
  * stratified sampling (data mixing / language rebalancing) and
  * per-stratum top-k selection (quality-based curation).
  *
  * Both are pure narrow/window transformations — no driver state, no
  * RNG: sampling decisions hash the row's own id, so they are stable
  * across re-runs, executors and engines (md5-based, DuckDB-mirrorable)
  * — the property that makes a 100 TB sampling job resumable and its
  * output reproducible.
  */
object Sampling {

  /** Per-mille hash bucket of an id: uniform, deterministic,
    * cross-engine (md5 of the id's decimal string, first 4 hex chars).
    */
  private[graft] def hashPermille(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 1000

  private[graft] def hashPermilleSql(id: String): String =
    s"CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000"

  /** Keep each row with a per-stratum probability: rows whose id-hash
    * per-mille falls below `rates(stratum) * 1000` survive. The
    * canonical corpus-mixing move — e.g. downsample the dominant
    * language while keeping the tail at 100% — as one stateless filter:
    * every executor decides from the row alone, nothing is shuffled,
    * and the same row always gets the same verdict.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val permille = rates.foldLeft(lit((defaultRate * 1000).toInt)) {
      case (acc, (k, r)) => when(stratum === lit(k), lit((r * 1000).toInt)).otherwise(acc)
    }
    df.filter(hashPermille(id) < permille)
  }

  /** Top `k` rows per stratum by `score` (descending), deterministic
    * under ties via ascending `id`. One shuffle on the stratum key; the
    * per-partition sort is the standard window top-k that survives any
    * corpus size as long as strata are numerous relative to executors
    * (skewed single-stratum corpora should pre-split the stratum).
    */
  def topKPerStratum(df: DataFrame, stratum: Column, score: Column,
                     id: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    df.withColumn("rnk",
        row_number().over(Window.partitionBy(stratum).orderBy(score.desc, id.asc)))
      .filter(col("rnk") <= k)
      .drop("rnk")
  }
}
