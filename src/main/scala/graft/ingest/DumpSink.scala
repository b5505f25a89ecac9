package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

import graft.ingest.InsertParser._

/** Statement re-synthesis: DataFrame rows → `INSERT INTO …` statements
  * (the dump sink path — reference `to_query`,
  * `source/postgres.rs:499-546`, with `'` → `''` escaping).
  *
  * Runs as a typed `map` on executors; the output Dataset[String] is
  * what the chunked datastore writer persists.
  */
object DumpSink {

  private def rowValues(row: org.apache.spark.sql.Row, schema: StructType): Vector[SqlValue] =
    schema.fields.toVector.zipWithIndex.map {
      case (f, i) =>
        if (row.isNullAt(i)) SqlNull
        else f.dataType match {
          case ByteType => SqlLong(row.getByte(i).toLong)
          case ShortType => SqlLong(row.getShort(i).toLong)
          case IntegerType => SqlLong(row.getInt(i).toLong)
          case LongType => SqlLong(row.getLong(i))
          case FloatType => SqlDouble(row.getFloat(i).toDouble)
          case DoubleType => SqlDouble(row.getDouble(i))
          case _: DecimalType => SqlDecimal(row.getDecimal(i))
          case BooleanType => SqlBool(row.getBoolean(i))
          // defense in depth — [[sqlSafe]] normalizes binary columns
          // before serialization, but a direct caller must still get a
          // valid pg hex literal, never JVM Array.toString garbage
          case BinaryType => SqlString(hexLiteral(row.getAs[Array[Byte]](i)))
          case _ => SqlString(String.valueOf(row.get(i)))
        }
    }

  /** pg_dump's bytea text form: `\x` + lowercase hex. */
  private def hexLiteral(b: Array[Byte]): String = {
    val sb = new StringBuilder(2 + b.length * 2)
    sb.append("\\x")
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** Normalize a source frame for SQL-statement serialization: types a
    * SQL literal cannot self-describe become their canonical TEXT
    * forms — binary → pg-style `\x` hex (what pg_dump itself emits,
    * and what the typed ingestion + live restore already round-trip),
    * arrays/structs/maps (Mongo-inferred schemas) → JSON. Without
    * this, [[rowValues]]'s fallthrough stringified `Array[Byte]` as
    * `[B@1a2b3c` and nested rows as Scala `toString` — silent
    * corruption on the JDBC/Mongo source paths (the dump-file and
    * pg_dump tool paths never see these types: bytea arrives as a hex
    * STRING literal). Runs as codegen'd Column expressions, no UDFs.
    */
  def sqlSafe(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, hex, lit, lower, to_json}
    val needsWork = df.schema.fields.exists(f => f.dataType match {
      case BinaryType | _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    })
    if (!needsWork) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case BinaryType =>
          concat(lit("\\x"), lower(hex(col(f.name)))).as(f.name)
        case _: ArrayType | _: MapType | _: StructType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  def toInsertStatements(df: DataFrame, database: String, table: String): Dataset[String] = {
    import df.sparkSession.implicits._
    val schema = df.schema
    val cols = schema.fields.map(_.name).toVector
    df.map(row => toQuery(Insert(database, table, cols, rowValues(row, schema))))
  }

  /** mysqldump-style extended INSERTs: up to `rowsPerStatement` VALUES
    * groups per statement (the tool's default output shape, which the
    * reference disables via `--skip-extended-insert`,
    * `source/mysql.rs:101-163`). Fewer, larger statements cut both dump
    * size and restore round-trips; `tableFromDump` re-expands them via
    * `parseMulti`.
    */
  def toExtendedInsertStatements(
      df: DataFrame,
      database: String,
      table: String,
      rowsPerStatement: Int = 1000,
      quoted: Boolean = false): Dataset[String] = {
    require(rowsPerStatement > 0, "rowsPerStatement must be positive")
    import df.sparkSession.implicits._
    val schema = df.schema
    // `quoted` backtick-quotes every identifier (mysqldump's own
    // convention) — the restore legs need it so camelCase or
    // reserved-word source columns survive the server's parser;
    // default false keeps engine-written dump bytes unchanged
    def bt(s: String) = if (quoted) "`" + s.replace("`", "``") + "`" else s
    val cols = schema.fieldNames.map(bt).mkString(", ")
    val target = s"${bt(database)}.${bt(table)}"
    df.mapPartitions { rows =>
      rows.grouped(rowsPerStatement).map { batch =>
        val tuples = batch.iterator
          .map(r => rowValues(r, schema).map(_.render).mkString("(", ", ", ")"))
          .mkString(", ")
        s"INSERT INTO $target ($cols) VALUES $tuples;"
      }
    }
  }

  /** COPY-format re-synthesis (pg_dump's default data layout): each
    * partition becomes one self-contained `COPY … FROM stdin;` block —
    * header, tab-separated data lines (`\N` nulls; backslash, tab, CR,
    * LF escaped per the COPY text format), `\.` terminator. Block =
    * partition mirrors the reference's chunking (each ~100 MB part is
    * independently restorable), and the splitter reassembles any number
    * of blocks back into one table.
    */
  def toCopyText(df: DataFrame, database: String, table: String,
                 quoted: Boolean = false): Dataset[String] = {
    import df.sparkSession.implicits._
    val schema = df.schema
    // `quoted` double-quotes every identifier in the header — the psql
    // restore leg needs it (an unquoted camelCase column case-folds on
    // the server and misses the DDL's quoted column); default false
    // keeps engine-written dump bytes unchanged
    def q(s: String) = if (quoted) "\"" + s.replace("\"", "\"\"") + "\"" else s
    val header =
      s"COPY ${q(database)}.${q(table)} (${schema.fieldNames.map(q).mkString(", ")}) FROM stdin;"
    df.map { row =>
      schema.fields.indices.map { i =>
        if (row.isNullAt(i)) "\\N"
        // same binary defense as rowValues — never Array.toString
        else if (schema.fields(i).dataType == BinaryType)
          escapeCopy(hexLiteral(row.getAs[Array[Byte]](i)))
        else escapeCopy(String.valueOf(row.get(i)))
      }.mkString("\t")
    }.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator(header) ++ it ++ Iterator("\\.")
    }
  }

  private[graft] def escapeCopy(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }

  /** Decode the full COPY text-format escape set (PostgreSQL emits
    * `\b \f \n \r \t \v`, `\xHH` hex, and `\OOO` octal for control
    * bytes) — our own writer only produces the common four, but foreign
    * dumps use them all.
    */
  private[graft] def unescapeCopy(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'v' => b.append('\u000b'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'x' if i + 2 < s.length && isHex(s.charAt(i + 2)) =>
            val end = if (i + 3 < s.length && isHex(s.charAt(i + 3))) i + 4 else i + 3
            b.append(Integer.parseInt(s.substring(i + 2, end), 16).toChar)
            i = end
          case o if o >= '0' && o <= '7' =>
            var end = i + 2
            while (end < s.length && end < i + 4 && s.charAt(end) >= '0' && s.charAt(end) <= '7') end += 1
            b.append(Integer.parseInt(s.substring(i + 1, end), 8).toChar)
            i = end
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}
