package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{Ddl, DumpReader, DumpSink}
import graft.model.{Statement, StatementKind}

/** Dump-pipeline queries (SURVEY §2.1 sources, §2.4 slices, §2.5 G4,
  * §2.6 re-synthesis).
  *
  * `s5_dump_roundtrip` is the flagship ingestion proof: a parquet table
  * is re-synthesized into INSERT statements (sink path), the statements
  * are re-joined into partition-sized text blobs, split, parsed, typed
  * (source path), and the result must hash-match the original table.
  * Everything runs on executors; the only driver work is schema
  * inference over a bounded sample.
  *
  * The `nationDump` queries exercise the full dump *shape* — DDL header,
  * INSERT body, ALTER TABLE footer — the way the reference's subset
  * engine sees it (`dump_header`/`dump_footer`,
  * `subset/src/postgres.rs:431-497`).
  */
object IngestQueries {

  private val NationDdl =
    "CREATE TABLE public.nation (n_nationkey bigint NOT NULL, n_name text, n_regionkey bigint);"
  private val NationFk =
    "ALTER TABLE ONLY public.nation ADD CONSTRAINT nation_region_fkey " +
      "FOREIGN KEY (n_regionkey) REFERENCES public.region (r_regionkey);"

  /** A complete synthetic dump of `nation`: header DDL, one INSERT per
    * row, FK footer — ordered like a real `pg_dump` stream.
    */
  private def nationDump(s: SparkSession, dir: String): Dataset[Statement] = {
    import s.implicits._
    val inserts = DumpSink.toInsertStatements(
      Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
      "public", "nation")
    DumpReader.statementsFromStrings(
      s, Seq(NationDdl).toDS().union(inserts).union(Seq(NationFk).toDS()))
  }

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
    }),

    // S7: statement classification by kind over a full dump
    // (reference get_row_type, source/postgres.rs:448-497).
    "s7_row_classifier" -> ((s, dir) =>
      nationDump(s, dir).toDF().groupBy(col("kind")).agg(count(lit(1)).as("n"))),

    // A2: dump header — everything before the first INSERT
    // (subset/src/postgres.rs:431-439,454-476).
    "a2_dump_header" -> ((s, dir) =>
      DumpReader.headerFooter(nationDump(s, dir))._1.select(col("kind"), col("table"))),

    // A3: dump footer — everything after the last INSERT
    // (subset/src/postgres.rs:442-450,478-497).
    "a3_dump_footer" -> ((s, dir) =>
      DumpReader.headerFooter(nationDump(s, dir))._2.select(col("kind"), col("table"))),

    // A5: the ordered header+rows+footer concatenation — first/last
    // statement kind by position proves the stream order survives
    // distribution (subset/src/postgres.rs:223-293).
    "a5_ordered_concat" -> ((s, dir) =>
      nationDump(s, dir).toDF().agg(
        count(lit(1)).as("n_total"),
        expr("min_by(kind, idx)").as("first_kind"),
        expr("max_by(kind, idx)").as("last_kind"))),

    // S10: FK extraction from the ALTER TABLE footer
    // (subset/src/postgres.rs:662-734). DDL-only driver collect.
    "s10_fk_edges" -> ((s, dir) => {
      import s.implicits._
      DumpReader.foreignKeys(nationDump(s, dir)).toDF()
    }),

    // S11: schema explain — table/column/ordinal from the CREATE TABLE
    // header (source/postgres.rs:78-111 + dump-parser create-table
    // column extraction, postgres/mod.rs:782-814).
    "s11_schema_explain" -> ((s, dir) => {
      import s.implicits._
      val ddl = nationDump(s, dir)
        .filter(_.kind == StatementKind.CreateTable)
        .map(st => (st.table, st.sql)).collect()
      ddl.toSeq.flatMap { case (t, sql) =>
        Ddl.createTableColumns(sql).zipWithIndex.map { case (c, i) => (t, c, i.toLong) }
      }.toDF("table_name", "column_name", "ordinal")
    }),

    // G4: order-sensitive CRC64-ECMA per table statement stream
    // (dump-parser/src/mongodb/mod.rs:213-233). No SQL oracle (DuckDB
    // has no CRC64) → rows-only check; the algorithm's check value is
    // asserted in StoreSpec.
    "g4_crc64" -> ((s, dir) =>
      DumpReader.collectionCrc64(nationDump(s, dir))),

    // S5/S6 COPY leg: pg_dump's DEFAULT data format — customer re-
    // synthesized as per-partition `COPY … FROM stdin;` blocks, split
    // back into blocks, decoded (\N nulls, backslash escapes), typed
    // from DDL, and hash-matched against the source.
    "s5_copy_roundtrip" -> ((s, dir) => {
      val ddl = "CREATE TABLE public.customer (c_custkey bigint, c_name text, " +
        "c_acctbal double precision, c_mktsegment text);"
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      val blocks = DumpSink.toCopyText(cust, "public", "customer")
      val parsed = DumpReader.statementsFromStrings(s, blocks)
      DumpReader.tableFromCopy(parsed, "public", "customer", Some(ddl))
    }),

    // S6/S8 extended-INSERT leg: mysqldump's default multi-row
    // `VALUES (…), (…), …` form both emitted (100 rows/statement) and
    // re-expanded, hash-matched against the source.
    "s6_extended_insert_roundtrip" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val stmts = DumpSink.toExtendedInsertStatements(cust, "public", "customer", 100)
      DumpReader.tableFromDump(
        DumpReader.statementsFromStrings(s, stmts), "public", "customer")
    }),

    // S9 typed: the CREATE TABLE header's declared types decide the
    // frame schema — zero driver-side sampling (compare s5_dump_roundtrip,
    // which exercises the inference path).
    "s9_ddl_typed_dump" -> ((s, dir) =>
      DumpReader.tableFromDump(nationDump(s, dir), "public", "nation", Some(NationDdl))),

    // S4/S5 via the DataSource V2 path: re-synthesized INSERT dump
    // written as text part-files, read back through
    // spark.read.format(SqlDumpSource) (one partition per part, pruned
    // columns, same global idx layout), re-typed, and hash-matched
    // against the source table.
    "s4_sqldump_dsv2" -> ((s, dir) => {
      import s.implicits._
      val stmts = DumpSink.toInsertStatements(
        Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        "public", "nation")
      val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-").toString
      stmts.coalesce(2).write.mode("overwrite").text(tmp)
      val v2 = s.read.format(classOf[graft.ingest.SqlDumpSource].getName).load(tmp)
        .as[Statement]
      DumpReader.tableFromDump(v2, "public", "nation")
    }),

    // S4 stdin leg: the reference's headline `pg_dump | replibyte` flow
    // (`source/postgres_stdin.rs:24-43`, CLI `-i` branch
    // `commands/dump.rs:171-206`). A pipe is a driver-local sequential
    // byte stream by nature; `Cli.spoolStdin` copies it chunked to a
    // temp file, after which parsing/typing run on the standard
    // distributed path. The in-memory stream here stands in for the
    // pipe; building it collects the 27-statement nation fixture only.
    "s4_stdin_ingest" -> ((s, dir) => {
      import s.implicits._
      val dumpText = nationDump(s, dir).orderBy(col("idx"))
        .map(_.sql).collect().mkString("\n")
      val spooled = graft.Cli.spoolStdin(
        new java.io.ByteArrayInputStream(dumpText.getBytes("UTF-8")),
        s, System.getProperty("java.io.tmpdir"))
      // consumed lazily when the frame materializes — defer deletion
      spooled.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(spooled)
      DumpReader.tableFromDump(
        DumpReader.statements(s, spooled.toString), "public", "nation", Some(NationDdl))
    }),

    // S3+N3+D3: full mongodump-archive cycle — table → BSON documents →
    // archive bytestream (CRC64 per collection) → parse+CRC-verify →
    // per-collection DataFrame (the mongorestore analog). Hash-matching
    // the source table proves the BSON codec and container layout
    // roundtrip (reference dump-parser/src/mongodb/mod.rs:100-248).
    "s3_mongo_archive_roundtrip" -> ((s, dir) => {
      import graft.ingest.MongoArchive
      val src = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
      // BOTH codec directions distributed (r15 writer, r16 reader):
      // executor-encoded chunks stream through the driver to a file,
      // then the driver indexes doc-aligned slices and executors decode
      // + CRC-verify them. Per-process UNIQUE temp path (ADVICE r16: a
      // fixed shared-tmp name races two concurrent bench processes —
      // one overwrites while the other's lazily-read slices scan — and
      // a pre-existing file owned by another user fails the write);
      // deleteOnExit because the returned frame reads the file lazily,
      // so it must outlive this builder.
      val path = java.nio.file.Files
        .createTempFile("graft-s3-roundtrip-", ".bin").toFile
      path.deleteOnExit()
      val fos = new java.io.FileOutputStream(path)
      try MongoArchive.writeTables(fos, "graft", Seq("customer" -> src))
      finally fos.close()
      MongoArchive.readDistributed(s, path.getPath,
        Map("graft.customer" -> src.schema))("graft.customer")
    }),

    // N3: per-collection CRC64 as declared in the rewritten archive's
    // EOF namespaces (no DuckDB CRC64 → rows-only check; check value
    // asserted in MongoArchiveSpec).
    "n3_archive_crc" -> ((s, dir) => {
      import s.implicits._
      import graft.ingest.MongoArchive
      val src = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name")).orderBy(col("n_nationkey"))
      val bos = new java.io.ByteArrayOutputStream()
      MongoArchive.writeTables(bos, "graft", Seq("nation" -> src))
      val archive = MongoArchive.read(bos.toByteArray)
      archive.crcs.toSeq.sortBy(_._1).toDF("prefix", "crc64")
    })
  )

  val oracle: Map[String, String] = Map(
    "s5_dump_roundtrip" ->
      ("SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey, " +
        "c_acctbal, c_mktsegment FROM customer"),
    "s5_dump_stats" ->
      "SELECT 'public' AS database, 'orders' AS \"table\", COUNT(*) AS total_rows FROM orders",
    "s7_row_classifier" ->
      ("SELECT 'create_table' AS kind, CAST(1 AS BIGINT) AS n " +
        "UNION ALL SELECT 'insert_into', COUNT(*) FROM nation " +
        "UNION ALL SELECT 'alter_table', CAST(1 AS BIGINT)"),
    "a2_dump_header" ->
      "SELECT 'create_table' AS kind, 'nation' AS \"table\"",
    "a3_dump_footer" ->
      "SELECT 'alter_table' AS kind, 'nation' AS \"table\"",
    "a5_ordered_concat" ->
      ("SELECT (SELECT COUNT(*) FROM nation) + 2 AS n_total, " +
        "'create_table' AS first_kind, 'alter_table' AS last_kind"),
    "s10_fk_edges" ->
      ("SELECT 'public' AS fromDatabase, 'nation' AS fromTable, 'n_regionkey' AS fromCol, " +
        "'public' AS toDatabase, 'region' AS toTable, 'r_regionkey' AS toCol"),
    "s11_schema_explain" ->
      ("SELECT * FROM (VALUES " +
        "('nation', 'n_nationkey', CAST(0 AS BIGINT)), " +
        "('nation', 'n_name', CAST(1 AS BIGINT)), " +
        "('nation', 'n_regionkey', CAST(2 AS BIGINT))) " +
        "AS t(table_name, column_name, ordinal)"),
    "s3_mongo_archive_roundtrip" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer",
    "s4_sqldump_dsv2" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation",
    "s9_ddl_typed_dump" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation",
    "s4_stdin_ingest" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation",
    "s5_copy_roundtrip" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer",
    "s6_extended_insert_roundtrip" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer"
  )
}
