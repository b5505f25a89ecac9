package graft.ingest

/** S6/S8: tokenizing parser for `INSERT INTO … (cols) VALUES (…)` plus
  * statement re-synthesis.
  *
  * Clean-room equivalent of the reference's tokenizer + extraction
  * (`dump-parser/src/postgres/mod.rs:241-780`, MySQL twin at
  * `mysql/mod.rs:231-750`) restricted to what dumps actually contain:
  * literal values (single-quoted strings with `''`/`\'` escapes, signed
  * integers and decimals, floats, hex `0x…`, booleans, NULL). Values the
  * grammar doesn't recognize are preserved verbatim as raw strings so a
  * parse→resynthesize pass is lossless.
  *
  * Type model mirrors `replibyte/src/types.rs:32-40`: the reference
  * holds i128 numbers; integral literals wider than Long are kept as
  * `SqlDecimal` (→ Spark `DecimalType(38,0)`, SURVEY §1.2).
  */
object InsertParser {

  sealed trait SqlValue { def render: String }
  final case class SqlString(v: String) extends SqlValue {
    // '' escaping on output — reference `to_query`, source/postgres.rs:499-546
    def render: String = "'" + v.replace("'", "''") + "'"
  }
  final case class SqlLong(v: Long) extends SqlValue { def render: String = v.toString }
  final case class SqlDecimal(v: BigDecimal) extends SqlValue { def render: String = v.toString }
  final case class SqlDouble(v: Double) extends SqlValue {
    // special floats must render QUOTED ('NaN', 'Infinity',
    // '-Infinity'): bare NaN/Infinity is not valid SQL for PostgreSQL
    // (pg_dump itself quotes them), and the quoted form roundtrips
    // through our own typed ingestion identically
    def render: String =
      if (v.isNaN || v.isInfinite) "'" + v.toString + "'" else v.toString
  }
  final case class SqlBool(v: Boolean) extends SqlValue { def render: String = v.toString }
  case object SqlNull extends SqlValue { def render: String = "NULL" }
  /** Unrecognized literal kept verbatim (e.g. `now()`, casts). */
  final case class SqlRaw(v: String) extends SqlValue { def render: String = v }

  final case class Insert(
      database: String,
      table: String,
      columns: Vector[String],
      values: Vector[SqlValue])

  /** Parse one INSERT statement's FIRST row; None if the statement is
    * not an INSERT. (Multi-row statements: [[parseMulti]].)
    */
  def parse(stmt: String, pgStrings: Boolean = false): Option[Insert] =
    parseMulti(stmt, pgStrings).flatMap(_.headOption)

  /** Parse an INSERT statement into one [[Insert]] per row group —
    * `VALUES (…), (…), …` (mysqldump's default "extended insert"
    * format, which the reference sidesteps by forcing
    * `--skip-extended-insert`, `source/mysql.rs:101-163`) as well as
    * the single-row form.
    */
  def parseMulti(stmt: String, pgStrings: Boolean = false): Option[Vector[Insert]] = {
    StatementSplitter.tableRef(stmt).flatMap { case (db, table) =>
      // a column list only exists if the first non-space char AFTER the
      // table name is '(' — `INSERT INTO t VALUES (...)` has none and
      // yields empty `columns` for positional alignment downstream.
      // Scanning from the table-name end (not for the first VALUES
      // word) keeps tables literally named `values` parsing correctly.
      val afterName = positionAfterTableName(stmt)
      var p = afterName
      while (p < stmt.length && stmt.charAt(p).isWhitespace) p += 1
      val hasColList = p < stmt.length && stmt.charAt(p) == '('
      val (cols, searchFrom) =
        if (hasColList) {
          val openCols = p
          val closeCols = matchingParen(stmt, openCols, pgStrings)
          if (closeCols < 0) return None
          (splitTop(stmt.substring(openCols + 1, closeCols), pgStrings)
            .map(c => StatementSplitter.unquoteIdent(c.trim)).toVector, closeCols)
        } else (Vector.empty[String], afterName)
      val valuesKw = indexOfWordIgnoreCase(stmt, "VALUES", searchFrom)
      if (valuesKw < 0) return None
      val tail = stmt.substring(valuesKw + "VALUES".length).trim.stripSuffix(";").trim
      val groups = splitTop(tail, pgStrings).map(_.trim).filter(_.nonEmpty)
      if (groups.isEmpty) return None
      val rows = groups.map { g =>
        // every top-level comma group must be a complete paren tuple
        if (!(g.startsWith("(") && matchingParen(g, 0, pgStrings) == g.length - 1)) return None
        val vals = splitTop(g.substring(1, g.length - 1), pgStrings)
          .map(v => parseValue(v.trim, pgStrings)).toVector
        if (cols.nonEmpty && cols.length != vals.length) return None
        Insert(db, table, cols, vals)
      }
      Some(rows.toVector)
    }
  }

  /** Index just past the table name of `INSERT INTO <name>…` — name may
    * be schema-qualified and each part quoted (quotes can enclose
    * spaces); the name ends at unquoted whitespace or '('.
    */
  private def positionAfterTableName(stmt: String): Int = {
    val n = stmt.length
    var i = 0
    def skipWs(): Unit = while (i < n && stmt.charAt(i).isWhitespace) i += 1
    def skipWord(): Unit = while (i < n && !stmt.charAt(i).isWhitespace) i += 1
    skipWs(); skipWord() // INSERT
    skipWs(); skipWord() // INTO
    skipWs()
    var done = false
    while (i < n && !done) {
      val c = stmt.charAt(i)
      if (c == '"' || c == '`') {
        val q = c; i += 1
        while (i < n && stmt.charAt(i) != q) i += 1
        if (i < n) i += 1
      } else if (c.isWhitespace || c == '(') done = true
      else i += 1
    }
    i
  }

  def parseValue(tok: String, pgStrings: Boolean = false): SqlValue = {
    if (tok.isEmpty) SqlRaw(tok)
    else if (tok.equalsIgnoreCase("NULL")) SqlNull
    else if (tok.equalsIgnoreCase("true")) SqlBool(true)
    else if (tok.equalsIgnoreCase("false")) SqlBool(false)
    else if (tok.head == '\'' && tok.last == '\'' && tok.length >= 2)
      SqlString(unescape(tok.substring(1, tok.length - 1), pgStrings))
    else if (tok.startsWith("0x") || tok.startsWith("0X")) SqlRaw(tok)
    else {
      val isNumeric = tok.matches("[+-]?\\d+") // integral
      if (isNumeric) {
        // i128-wide integers survive as decimal (types.rs:34 → SURVEY §1.2)
        try SqlLong(tok.toLong)
        catch { case _: NumberFormatException => SqlDecimal(BigDecimal(tok)) }
      } else if (tok.matches("[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?")) {
        SqlDouble(tok.toDouble)
      } else SqlRaw(tok)
    }
  }

  /** Decode a string-literal body to its LOGICAL value, per the dump's
    * declared dialect. pg (standard_conforming_strings=on): `''` is the
    * only escape, backslash is literal — the old chained .replace also
    * collapsed `\'`, corrupting pg content like `a\'b` (dumped as
    * `a\''b`). mysql: full escape set per the reference manual's
    * string-literal table; an unrecognized `\x` drops the backslash
    * (mysql semantics), except `\%`/`\_` which keep it.
    */
  private[ingest] def unescape(body: String, pgStrings: Boolean = false): String = {
    val n = body.length
    val b = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = body.charAt(i)
      if (c == '\'' && i + 1 < n && body.charAt(i + 1) == '\'') {
        b.append('\''); i += 2
      } else if (!pgStrings && c == '\\' && i + 1 < n) {
        val d = body.charAt(i + 1)
        d match {
          case '0' => b.append('\u0000')
          case 'b' => b.append('\b')
          case 'n' => b.append('\n')
          case 'r' => b.append('\r')
          case 't' => b.append('\t')
          case 'Z' => b.append('\u001a')
          case '%' | '_' => b.append('\\').append(d) // LIKE escapes keep the backslash
          case other => b.append(other) // incl. \' \" \\ → the literal char
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Re-synthesize the INSERT — reference `to_query`
    * (`source/postgres.rs:499-546`): `INSERT INTO db.table (cols) VALUES
    * (vals);` with `'` → `''` escaping.
    */
  def toQuery(ins: Insert): String = {
    val cols = ins.columns.mkString(", ")
    val vals = ins.values.map(_.render).mkString(", ")
    s"INSERT INTO ${ins.database}.${ins.table} ($cols) VALUES ($vals);"
  }

  /** Split a comma-separated list at the top nesting level (commas inside
    * strings or parens don't split).
    */
  def splitTop(s: String, pgStrings: Boolean = false): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var inQuote = false
    var start = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\'') {
          // ORDER MATTERS (r19): a MySQL backslash-escaped quote must
          // be recognized BEFORE the ''-doubling rule — in `'a\''` the
          // `\'` is an escaped quote and the NEXT quote CLOSES the
          // string; treating the `''` pair as doubling overshoots the
          // string end and the parse fails
          if (!pgStrings && StatementSplitter.oddBackslashesBefore(s, i)) ()
          else if (i + 1 < n && s.charAt(i + 1) == '\'') i += 1 // '' stays in
          else inQuote = false
        }
      } else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    if (start < n) out += s.substring(start, n)
    out.result()
  }

  private[ingest] def matchingParen(s: String, open: Int, pgStrings: Boolean = false): Int = {
    var depth = 0
    var inQuote = false
    var i = open
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\'') {
          // same ordering as splitTop: backslash escape before doubling
          if (!pgStrings && StatementSplitter.oddBackslashesBefore(s, i)) ()
          else if (i + 1 < n && s.charAt(i + 1) == '\'') i += 1
          else inQuote = false
        }
      } else c match {
        case '\'' => inQuote = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def indexOfWordIgnoreCase(s: String, word: String, from: Int): Int = {
    var i = math.max(0, from)
    val n = s.length
    val w = word.length
    var inQuote = false
    while (i + w <= n) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else if (c == '\'') inQuote = true
      else if (s.regionMatches(true, i, word, 0, w) &&
        (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
        (i + w == n || !s.charAt(i + w).isLetterOrDigit)) return i
      i += 1
    }
    -1
  }
}
