package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{FkEdge, Statement, StatementKind}

/** S4/S5 Spark integration: `.sql` dump ingestion as a DataFrame
  * pipeline.
  *
  * Scale design: a dump "file" at production scale is a directory of
  * chunk parts (the reference chunks at 100 MB,
  * `tasks/full_dump.rs:72-77`), so *whole-file-per-task* is the natural
  * parallel unit — each part is split into statements independently,
  * which is correct because chunk boundaries in the reference's own
  * format always fall between statements. Statement parsing, typing,
  * and transformation then run distributed; nothing touches the driver
  * except the (tiny) DDL header/footer and schema inference over a
  * bounded sample.
  */
object DumpReader {

  /** Read dump file(s) into a Dataset of classified statements.
    * `idx` is the statement position (per file, files ordered by name —
    * matching the reference's part-enumeration order on restore,
    * `datastore/local_disk.rs:183-207`).
    */
  def statements(spark: SparkSession, path: String): Dataset[Statement] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String]
      .flatMap { blob =>
        StatementSplitter.split(blob).iterator.zipWithIndex.map { case (raw, i) =>
          val (db, table) = if (raw.kind == StatementKind.CommentLine) ("", "")
          else StatementSplitter.tableRef(raw.text).getOrElse(("", ""))
          Statement(i.toLong, raw.kind, db, table, raw.text)
        }
      }
  }

  /** Split already-isolated statement strings (one per row) — used when
    * statements were produced upstream (e.g. re-synthesis roundtrips).
    */
  def statementsFromStrings(spark: SparkSession, stmts: Dataset[String]): Dataset[Statement] = {
    import spark.implicits._
    stmts.mapPartitions { it =>
      // join the partition back into one blob so the splitter (not the
      // upstream row boundaries) decides statement boundaries
      val blob = it.mkString("\n")
      StatementSplitter.split(blob).iterator.zipWithIndex.map { case (raw, i) =>
        val (db, table) = if (raw.kind == StatementKind.CommentLine) ("", "")
        else StatementSplitter.tableRef(raw.text).getOrElse(("", ""))
        Statement(i.toLong, raw.kind, db, table, raw.text)
      }
    }
  }

  /** G1 over a dump: per-table stats in one distributed pass — reference
    * `table_stats_by_database_and_table_name`
    * (`subset/src/postgres.rs:499-570`).
    */
  def tableStats(stmts: Dataset[Statement]): DataFrame =
    stmts.toDF()
      .filter(col("kind") === StatementKind.InsertInto)
      .groupBy(col("database"), col("table"))
      .agg(
        count(lit(1)).as("total_rows"),
        min(col("idx")).as("first_insert_idx"),
        max(col("idx")).as("last_insert_idx"))

  /** A2/A3: header (everything before the first INSERT) and footer
    * (everything after the last) — reference `dump_header`/`dump_footer`
    * (`subset/src/postgres.rs:431-497`).
    */
  def headerFooter(stmts: Dataset[Statement]): (DataFrame, DataFrame) = {
    val inserts = stmts.toDF().filter(col("kind") === StatementKind.InsertInto)
    val bounds = inserts.agg(
      min(col("idx")).as("first_idx"), max(col("idx")).as("last_idx"))
    val header = stmts.toDF().join(bounds, col("idx") < col("first_idx"), "left_semi")
    val footer = stmts.toDF().join(bounds, col("idx") > col("last_idx"), "left_semi")
    (header, footer)
  }

  /** S10 over a dump: the FK edge list (drives the subset engine). The
    * ALTER TABLE footer is tiny — collect is over DDL, never data.
    */
  def foreignKeys(stmts: Dataset[Statement]): Seq[FkEdge] = {
    import stmts.sparkSession.implicits._
    stmts.filter(_.kind == StatementKind.AlterTable)
      .map(_.sql).collect().toSeq
      .flatMap(Ddl.foreignKey)
  }

  /** Materialize one table of a dump as a typed DataFrame. Schema: the
    * column list comes from the INSERT statements themselves; types are
    * inferred from literal shape on a sample (reference infers per row,
    * `source/postgres.rs:378-411`; doing it once over a sample gives
    * every row the same schema, which is what a columnar engine needs).
    */
  def tableFromDump(stmts: Dataset[Statement], database: String, table: String): DataFrame = {
    import stmts.sparkSession.implicits._
    val rows: Dataset[(Vector[String], Vector[String], Vector[Int])] = stmts
      .filter(s => s.kind == StatementKind.InsertInto &&
        s.database == database && s.table == table)
      .map { s =>
        InsertParser.parse(s.sql) match {
          case Some(ins) =>
            (ins.columns,
              ins.values.map(v => if (v == InsertParser.SqlNull) null else v.render),
              ins.values.map(typeTag))
          case None => (Vector.empty[String], Vector.empty[String], Vector.empty[Int])
        }
      }
      .filter(_._1.nonEmpty)

    // schema inference over a bounded sample (one small job, never the
    // full data)
    val sample = rows.limit(1000).collect()
    if (sample.isEmpty) return stmts.sparkSession.emptyDataFrame
    val columns = sample(0)._1
    val types: Seq[DataType] = columns.indices.map { i =>
      val tags = sample.iterator.map(_._3.lift(i).getOrElse(TagNull))
        .filter(_ != TagNull).toSet
      if (tags.isEmpty) StringType
      else if (tags == Set(TagBool)) BooleanType
      else if (tags.subsetOf(Set(TagLong, TagDecimal, TagDouble))) tags.max match {
        // numeric promotion: Double > Decimal(38,0) > Long
        case TagLong => LongType
        case TagDecimal => DecimalType(38, 0)
        case _ => DoubleType
      }
      else StringType
    }
    val df = rows.map(_._2).toDF("vals")
    val cols = columns.zipWithIndex.map { case (name, i) =>
      val raw = col("vals").getItem(i)
      val typed = types(i) match {
        case StringType =>
          // strip the SQL quoting the render step added
          when(raw.isNull, lit(null))
            .otherwise(regexp_replace(expr(s"substring(vals[$i], 2, length(vals[$i]) - 2)"), "''", "'"))
        case dt => raw.cast(dt)
      }
      typed.as(name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private val TagNull = 0
  private val TagLong = 1
  private val TagDecimal = 2
  private val TagDouble = 3
  private val TagBool = 4
  private val TagString = 5

  private def typeTag(v: InsertParser.SqlValue): Int = v match {
    case InsertParser.SqlNull => TagNull
    case _: InsertParser.SqlLong => TagLong
    case _: InsertParser.SqlDecimal => TagDecimal
    case _: InsertParser.SqlDouble => TagDouble
    case _: InsertParser.SqlBool => TagBool
    case _ => TagString
  }
}
