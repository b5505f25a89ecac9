package graft.ingest

import graft.model.FkEdge

/** S9/S10: DDL extraction — CREATE TABLE column lists (schema bootstrap)
  * and ALTER TABLE foreign keys (the subset engine's edge list).
  */
object Ddl {

  /** S9: column names of a CREATE TABLE statement — first word of each
    * top-level comma group in the parenthesized body (reference
    * `dump-parser/src/postgres/mod.rs:782-814`). Constraint clauses
    * (PRIMARY KEY …, CONSTRAINT …) are skipped.
    */
  private val constraintKeywords = Set(
    "PRIMARY", "FOREIGN", "UNIQUE", "CONSTRAINT", "CHECK", "KEY", "INDEX", "EXCLUDE")

  def createTableColumns(stmt: String): Vector[String] = {
    val open = stmt.indexOf('(')
    if (open < 0) return Vector.empty
    val close = stmt.lastIndexOf(')')
    if (close <= open) return Vector.empty
    InsertParser.splitTop(stmt.substring(open + 1, close)).flatMap { group =>
      group.trim.split("\\s+", 2).headOption
        .filter(w => w.nonEmpty && !constraintKeywords.contains(w.toUpperCase))
        .map(StatementSplitter.unquoteIdent)
    }
  }

  /** S9+: column name AND Spark type from a CREATE TABLE statement —
    * the declared SQL type decides the frame schema, removing the
    * row-sample inference `tableFromDump` otherwise needs. Unknown or
    * exotic SQL types conservatively map to STRING (the dump literal
    * survives verbatim).
    */
  def createTableColumnTypes(stmt: String): Vector[(String, org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.types._
    val stopWords = Set("NOT", "NULL", "DEFAULT", "PRIMARY", "UNIQUE",
      "REFERENCES", "CHECK", "CONSTRAINT", "GENERATED", "COLLATE")
    val open = stmt.indexOf('(')
    if (open < 0) return Vector.empty
    val close = stmt.lastIndexOf(')')
    if (close <= open) return Vector.empty
    InsertParser.splitTop(stmt.substring(open + 1, close)).flatMap { group =>
      val words = group.trim.split("\\s+").toVector
      words.headOption
        .filter(w => w.nonEmpty && !constraintKeywords.contains(w.toUpperCase))
        .map { rawName =>
          val typeWords = words.drop(1).takeWhile(w => !stopWords.contains(w.toUpperCase))
          val fullType = typeWords.mkString(" ").trim.toLowerCase
          val sqlType = fullType.takeWhile(_ != '(').trim
          // numeric(p,s)/numeric(p) keep their declared precision and
          // scale — mapping to (38,0) would silently round fractions
          // away. Unparameterized numeric becomes (38,18): fractional
          // data survives, and a >20-integer-digit value fails the cast
          // LOUDLY under ANSI mode instead of rounding.
          val DecArgs = """[^(]*\((\d+)\s*,\s*(\d+)\).*""".r
          val DecPrec = """[^(]*\((\d+)\).*""".r
          val dt = sqlType match {
            case "bigint" | "int8" | "bigserial" | "integer" | "int" | "int4" |
                 "serial" | "smallint" | "int2" => LongType
            case "double precision" | "float8" | "real" | "float4" | "float" => DoubleType
            case "boolean" | "bool" => BooleanType
            case "numeric" | "decimal" => fullType match {
              case DecArgs(p, s) => DecimalType(p.toInt, s.toInt)
              case DecPrec(p) => DecimalType(p.toInt, 0)
              case _ => DecimalType(38, 18)
            }
            case _ => StringType // text, varchar, dates, json, unknown
          }
          (StatementSplitter.unquoteIdent(rawName), dt)
        }
    }
  }

  private val MysqlMarkers =
    """(?i)ENGINE\s*=|AUTO_INCREMENT|DEFAULT\s+CHARSET|CHARACTER\s+SET\s|COLLATE\s*=|\bunsigned\b""".r
  private val PgMarkers =
    ("""(?i)\bbytea\b|\bjsonb\b|\buuid\b|\btimestamp\s+with(out)?\s+time\s+zone\b""" +
      """|\b(big|small)?serial\b|::|\bnextval\s*\(""").r

  /** Best-effort SQL dialect of a stored CREATE TABLE statement —
    * Some("mysql") / Some("pg") only on unambiguous markers, None
    * otherwise. Live restore legs replay the dump's ORIGINAL DDL for
    * type fidelity (r17), which is only valid when the DDL's dialect
    * matches the destination: backticked ENGINE=InnoDB DDL dies under
    * psql's ON_ERROR_STOP, pg DDL feeds mysql types it lacks. A
    * CONFIRMED mismatch falls back to the synthesized frame-schema DDL;
    * ambiguity keeps the fidelity default (plain `CREATE TABLE t (a
    * integer)` is valid in both).
    */
  def dialect(ddl: String): Option[String] = {
    // identifier quoting is itself a dialect marker: backticks are
    // MySQL, double quotes are pg/ANSI (MySQL's default sql_mode
    // rejects "ident") — without this vote, the engine's own
    // synthesized DDL (double-quoted idents, no type markers) read as
    // ambiguous and the mysql restore leg would replay it verbatim
    // (r19). Markers count only OUTSIDE single-quoted string literals
    // (a DEFAULT '"' or COMMENT '`' must not vote) — but where a
    // string ENDS itself depends on the dialect being detected
    // (pg: '' doubling only; MySQL: \' escapes too), so each probe
    // strips under BOTH rules and a marker votes only when it
    // survives BOTH interpretations. A desynced single-rule strip
    // leaked string content into the vote (r19 review: a MySQL
    // COMMENT 'don\'t use "raw"' flipped a confirmed-mysql DDL to
    // ambiguous and the pg leg replayed it). The strip is a scanner
    // that also tracks "…"/`…` QUOTED-IDENTIFIER spans (ADVICE r19):
    // the earlier regex strip treated an apostrophe inside CREATE
    // TABLE "it's" or `don't` as a string-literal start, desyncing
    // both strips so real quote markers could be swallowed. Both
    // strips recognize the same ident-quoting union (the DDL's true
    // dialect is exactly what's being decided); only the
    // string-literal ESCAPE rule differs between them.
    val strips = Seq(
      stripStrings(ddl, mysqlRules = false), // pg string rules
      stripStrings(ddl, mysqlRules = true))  // mysql string rules
    def inBoth(probe: String => Boolean) = strips.forall(probe)
    val mysql = inBoth(_.contains('`')) ||
      inBoth(s => MysqlMarkers.findFirstIn(s).isDefined)
    val pg = inBoth(_.contains('"')) ||
      inBoth(s => PgMarkers.findFirstIn(s).isDefined)
    (mysql, pg) match {
      case (true, false) => Some("mysql")
      case (false, true) => Some("pg")
      case _ => None
    }
  }

  /** Dialect-probe strip: string literals collapse to `''` and quoted
    * identifiers to bare `""`/`` `` `` (delimiters kept — they ARE the
    * vote; content dropped — it must never vote or open a string).
    * `mysqlRules` selects the string-literal escape rule: MySQL honors
    * backslash escapes inside `'…'` (and treats `"…"` as a string with
    * the same escapes); pg doubles quotes only. Both rules scan `"…"`
    * and `` `…` `` as quoted spans with doubled-delimiter escapes.
    */
  private[graft] def stripStrings(s: String, mysqlRules: Boolean): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    // skip a quoted span: cursor starts just after the opening `q`;
    // returns the index just after the closing delimiter. `qq` doubling
    // always escapes; backslash escapes only when the rule says so.
    def skip(from: Int, q: Char, backslash: Boolean): Int = {
      var j = from
      while (j < n) {
        val c = s.charAt(j)
        if (backslash && c == '\\' && j + 1 < n) j += 2
        else if (c == q && j + 1 < n && s.charAt(j + 1) == q) j += 2
        else if (c == q) return j + 1
        else j += 1
      }
      n
    }
    while (i < n) {
      s.charAt(i) match {
        case '\'' =>
          out.append("''")
          i = skip(i + 1, '\'', backslash = mysqlRules)
        case '"' =>
          out.append("\"\"")
          i = skip(i + 1, '"', backslash = mysqlRules)
        case '`' =>
          out.append("``")
          i = skip(i + 1, '`', backslash = false)
        case c =>
          out.append(c)
          i += 1
      }
    }
    out.toString
  }

  private val FkPattern =
    ("""(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?([\w"`.]+)\s+.*?FOREIGN\s+KEY\s*\(([^)]+)\)""" +
      """\s*REFERENCES\s+([\w"`.]+)\s*\(([^)]+)\)""").r

  /** S10: FK edge of an `ALTER TABLE … ADD CONSTRAINT … FOREIGN KEY (c)
    * REFERENCES t(c)` statement — reference
    * `get_alter_table_foreign_key`, `subset/src/postgres.rs:662-734`.
    */
  def foreignKey(stmt: String): Option[FkEdge] =
    FkPattern.findFirstMatchIn(stmt).map { m =>
      val (fromDb, fromTable) = splitQualified(m.group(1))
      val (toDb, toTable) = splitQualified(m.group(3))
      FkEdge(
        fromDb, fromTable, StatementSplitter.unquoteIdent(m.group(2).trim),
        toDb, toTable, StatementSplitter.unquoteIdent(m.group(4).trim))
    }

  private def splitQualified(name: String): (String, String) = {
    // quote-aware (r19): dots INSIDE quoted identifiers are part of the
    // name — same rule as StatementSplitter.tableRef, so FK edges and
    // table refs agree on ("my.schema", "orders") and the subset
    // engine's joins line up
    val parts = StatementSplitter.splitQualified(name)
      .map(StatementSplitter.unquoteIdent)
    if (parts.length >= 2) (parts(0), parts(1)) else ("public", parts(0))
  }
}
