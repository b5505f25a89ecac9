package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` are assembled from per-module packs under
  * `graft.queries`; every key present in `queries` with a matching
  * `oracleSql` entry is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.CoreQueries.queries, graft.queries.CoreQueries.oracle),
      (graft.queries.TransformQueries.queries, graft.queries.TransformQueries.oracle),
      (graft.queries.SubsetQueries.queries, graft.queries.SubsetQueries.oracle),
      (graft.queries.IngestQueries.queries, graft.queries.IngestQueries.oracle),
      (graft.queries.OpsQueries.queries, graft.queries.OpsQueries.oracle),
      (graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracle),
      (graft.queries.StoreQueries.queries, graft.queries.StoreQueries.oracle),
      (graft.queries.EventQueries.queries, graft.queries.EventQueries.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _)
}
