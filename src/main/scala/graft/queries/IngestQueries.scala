package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{DumpReader, DumpSink}

/** Dump-pipeline queries (SURVEY §2.1 sources + §2.6 re-synthesis).
  *
  * `s5_dump_roundtrip` is the flagship ingestion proof: a parquet table
  * is re-synthesized into INSERT statements (sink path), the statements
  * are re-joined into partition-sized text blobs, split, parsed, typed
  * (source path), and the result must hash-match the original table.
  * Everything runs on executors; the only driver work is schema
  * inference over a bounded sample.
  */
object IngestQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s5_dump_roundtrip" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val stmts = DumpSink.toInsertStatements(cust, "public", "customer")
      val parsed = DumpReader.statementsFromStrings(s, stmts)
      DumpReader.tableFromDump(parsed, "public", "customer")
        .select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
    }),

    // G1 over a synthesized dump: statement stats per table.
    "s5_dump_stats" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val stmts = DumpSink.toInsertStatements(
        orders.select(col("o_orderkey"), col("o_orderstatus")), "public", "orders")
      val parsed = DumpReader.statementsFromStrings(s, stmts)
      DumpReader.tableStats(parsed)
        .select(col("database"), col("table"), col("total_rows"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s5_dump_roundtrip" ->
      ("SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
        "c_acctbal, c_mktsegment FROM customer"),
    "s5_dump_stats" ->
      "SELECT 'public' AS database, 'orders' AS \"table\", COUNT(*) AS total_rows FROM orders"
  )
}
