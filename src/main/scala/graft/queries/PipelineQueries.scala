package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.{SourceFilters, TableRef, TransformerBinding}
import graft.pipeline.Pipeline
import graft.transform.Transformers

/** Pipeline-level queries: F1/F2 table filters through the dump plan. */
object PipelineQueries {

  private def summary(tables: Seq[(String, DataFrame)]): DataFrame =
    tables.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("table_name"), col("n_rows"))
    }.reduce(_.unionByName(_))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: skip filter — the skipped table never reaches the plan
    // (reference map build + checks, source/postgres.rs:239-296).
    "f1_skip_tables" -> ((s, dir) => {
      val plan = Pipeline.dumpPlan(
        t => Tables.load(s, dir, t),
        Pipeline.DumpJobConfig(
          tables = Seq("customer", "orders", "nation"),
          filters = SourceFilters(skipTables = Seq(TableRef("public", "orders")))))
      summary(plan.toSeq.sortBy(_._1))
    }),

    // F2: only_tables projection with a transformer applied through the
    // pipeline (reference source/postgres.rs:132-139).
    "f2_only_tables" -> ((s, dir) => {
      val plan = Pipeline.dumpPlan(
        t => Tables.load(s, dir, t),
        Pipeline.DumpJobConfig(
          tables = Seq("customer", "orders", "nation"),
          filters = SourceFilters(onlyTables = Seq(TableRef("public", "customer"))),
          bindings = Seq(TransformerBinding("public", "customer", "c_name", "redacted"))))
      plan("customer").select(col("c_custkey"), col("c_name"))
    })
  )

  val oracle: Map[String, String] = Map(
    "f1_skip_tables" ->
      ("SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer " +
        "UNION ALL SELECT 'nation', COUNT(*) FROM nation"),
    "f2_only_tables" ->
      s"SELECT c_custkey, ${Transformers.redactedSql("c_name")} AS c_name FROM customer"
  )
}
