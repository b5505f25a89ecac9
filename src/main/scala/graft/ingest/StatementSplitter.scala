package graft.ingest

import graft.model.StatementKind

/** S5: statement splitter — reassembles SQL statements from raw dump
  * text regardless of line breaks.
  *
  * Clean-room state machine with the same observable behavior as the
  * reference's `list_statements` (`dump-parser/src/utils.rs:161-302`):
  *   - single-quoted strings; `''` acts as close+reopen (net effect:
  *     escaped quote), `\'` inside a string does not close it;
  *   - parenthesis balance tracked outside strings; unbalanced
  *     statements are flagged invalid rather than dropped;
  *   - `--` starts a full-line comment only between statements (after
  *     whitespace); inside a statement it blanks the rest of the line
  *     (a `;` inside such a partial comment does not end the statement);
  *   - PostgreSQL dollar-quoted strings (`$$…$$`, `$tag$…$tag$`) are
  *     opaque: semicolons and quotes inside a function body do not end
  *     the statement. The reference splits such bodies at the first
  *     inner `;` (its own test fixture shows the truncation,
  *     `dump-parser/src/utils.rs:874-948`) — a limitation not
  *     reproduced;
  *   - a statement ends at `;` outside strings and comments.
  *
  * The reference warns this path runs "thousands of times per second"
  * (`utils.rs:157-161`) — here it runs inside `flatMap` on executors, so
  * it is also the per-row hot path: one pass, no regex, no allocation
  * beyond the output slices.
  */
object StatementSplitter {

  final case class Raw(kind: String, text: String, valid: Boolean)

  /** String-literal dialect of a dump blob: pg_dump (9.1+) always
    * emits `SET standard_conforming_strings = on;` in its header,
    * declaring that backslash is a LITERAL character inside strings
    * (the `''` doubling is the only quote escape). mysqldump never
    * emits it — MySQL strings use backslash escapes (`\'`, `\\`, `\n`,
    * …). The two dialects genuinely disagree on where a string ends
    * (PG `'a\'` is a complete literal ending in a backslash; MySQL
    * reads on), so the scan MUST know which rules apply; this marker
    * is how the dump itself says so. Engine-written dumps store the
    * marker too ([[graft.pipeline.Pipeline.dump]]) — DumpSink
    * synthesis is PG-semantics (`''` doubling, raw backslashes).
    */
  private val PgStringsMarker =
    """(?im)^\s*SET\s+standard_conforming_strings\s*=\s*'?on'?\s*;""".r

  /** Position of the first DATA statement (INSERT / COPY … FROM stdin)
    * — the end of the header region where dialect declarations live.
    */
  private val FirstDataStmt =
    """(?im)^\s*(INSERT\s+INTO\b|COPY\s+\S+.*\bFROM\s+stdin)""".r

  /** The marker is only honored in the PRE-DATA header (ADVICE r17):
    * pg_dump emits its SET block before any data, so a match inside or
    * after a data statement is dump CONTENT (e.g. a MySQL string
    * literal that happens to contain the marker text), not a dialect
    * declaration — honoring it there would flip a whole MySQL blob to
    * pg escape rules.
    */
  def pgStrings(text: String): Boolean = {
    val headerEnd = FirstDataStmt.findFirstMatchIn(text)
      .map(_.start).getOrElse(text.length)
    PgStringsMarker.findFirstMatchIn(text).exists(_.start < headerEnd)
  }

  /** mysqldump's own header signature: the `-- MySQL dump` banner or a
    * bang-versioned conditional comment (slash-star-bang-NNNNN),
    * honored only in the PRE-DATA region
    * (same rule as [[pgStrings]] — a chunk that starts mid-data
    * can only match on content, which is ignored). Used to scope the
    * chunked-dump dialect floor (ADVICE r18): a directory mixing dumps
    * from different sources must not force pg string rules onto a file
    * that declares ITSELF a MySQL dump — the floor exists for
    * headerless pg chunk siblings, and a mysqldump file is never
    * headerless.
    */
  private val MySqlHeaderMarker =
    """(?m)^(--\s+MySQL dump\b|/\*!\d{4,6}\s)""".r

  def mysqlHeader(text: String): Boolean = {
    val headerEnd = FirstDataStmt.findFirstMatchIn(text)
      .map(_.start).getOrElse(text.length)
    MySqlHeaderMarker.findFirstMatchIn(text).exists(_.start < headerEnd)
  }

  /** True when an ODD number of consecutive backslashes immediately
    * precedes position `i` — under MySQL escape rules that means the
    * char at `i` is escaped; an even count is escaped backslashes and
    * the char at `i` stands on its own. The pre-r17 single-char check
    * mis-read `'a\\'` (string ending in an escaped backslash) as an
    * escaped quote and ran past the end of the literal.
    */
  private[ingest] def oddBackslashesBefore(s: String, i: Int): Boolean = {
    var k = i - 1
    var c = 0
    while (k >= 0 && s.charAt(k) == '\\') { c += 1; k -= 1 }
    (c & 1) == 1
  }

  def split(text: String): Vector[Raw] = split(text, None)

  /** `dialect`: Some(pg) when the caller KNOWS the string-literal
    * dialect (e.g. a chunked dump whose first part declared it — a
    * headerless later chunk must not default to MySQL rules); None
    * detects from this blob's own header.
    */
  def split(text: String, dialect: Option[Boolean]): Vector[Raw] = {
    val out = Vector.newBuilder[Raw]
    scanStatements(text, dialect) { (kind, s, e, valid, _) =>
      emit(out, kind, text.substring(s, e), valid)
    }
    out.result()
  }

  /** Offset just past the LAST complete statement in `text` (a
    * top-level `;`, a terminated COPY block, or a full comment line) —
    * 0 when no statement has completed yet. This is the safe cut point
    * for rolling a streamed dump into chunk files: everything before it
    * splits identically on its own, everything after carries over.
    * Runs the same scan as [[split]], so the two can never disagree on
    * where statements end.
    */
  def lastCompleteBoundary(text: String, dialect: Option[Boolean]): Int = {
    var last = 0
    scanStatements(text, dialect) { (_, _, e, _, terminated) =>
      if (terminated) last = e
    }
    last
  }

  /** The one statement-boundary state machine behind [[split]] and
    * [[lastCompleteBoundary]]: walks `text` under the string-literal
    * `dialect` rules and reports every statement span as
    * `sink(kind, start, end, valid, terminated)` — `terminated` is
    * false only for the trailing unfinished span (no `;`, unterminated
    * COPY block, or comment line with no newline).
    */
  private def scanStatements(text: String, dialect: Option[Boolean])(
      sink: (String, Int, Int, Boolean, Boolean) => Unit): Unit = {
    val pg = dialect.getOrElse(pgStrings(text))
    var inQuote = false
    var dollarTag: String = null // inside $tag$ … $tag$ when non-null
    var parenDepth = 0
    var unbalanced = false
    var commentLine = false    // full-line comment (between statements)
    var partialComment = false // -- inside a statement
    var statementComplete = true
    var prevWhitespace = true
    var start = 0
    val n = text.length
    var i = 0
    // a `$tag$` delimiter starting at position i, or null (pg rules:
    // the tag may be empty, else it must not start with a digit — so
    // `$1$2` positional params are never mistaken for a delimiter)
    def dollarDelimAt(i: Int): String = {
      if (text.charAt(i) != '$') return null
      var j = i + 1
      while (j < n && (text.charAt(j).isLetterOrDigit || text.charAt(j) == '_')) j += 1
      if (j < n && text.charAt(j) == '$' && (j == i + 1 || !text.charAt(i + 1).isDigit))
        text.substring(i, j + 1)
      else null
    }
    while (i < n) {
      val c = text.charAt(i)
      if (commentLine) {
        if (c == '\n') {
          sink(StatementKind.CommentLine, start, i, true, true)
          start = i + 1
          commentLine = false
          statementComplete = true
          prevWhitespace = true
        }
      } else if (dollarTag != null) {
        // inside a dollar-quoted body: only its own closing tag matters
        if (c == '$' && text.startsWith(dollarTag, i)) {
          i += dollarTag.length - 1
          dollarTag = null
        }
      } else if (c == '$' && !inQuote && !partialComment &&
          // a '$' glued to an identifier (pg allows '$' in names, e.g.
          // a$$b) is part of the name, not a quote delimiter
          (i == 0 || { val p = text.charAt(i - 1); !p.isLetterOrDigit && p != '_' && p != '$' }) &&
          dollarDelimAt(i) != null) {
        dollarTag = dollarDelimAt(i)
        i += dollarTag.length - 1
        statementComplete = false
        prevWhitespace = false
      } else if (c == '\'' && !partialComment) {
        if (inQuote && !pg && oddBackslashesBefore(text, i)) {
          // MySQL-dialect backslash-escaped quote: stays open. Under
          // pg rules (declared by the dump's own
          // standard_conforming_strings marker) a backslash is literal
          // and never escapes the quote.
        } else {
          inQuote = !inQuote
        }
        statementComplete = false
        prevWhitespace = false
      } else if (inQuote) {
        // any char inside a string is literal (including ; - and newline)
        ()
      } else if (partialComment) {
        if (c == '\n') { partialComment = false; prevWhitespace = true }
      } else if (c == '(') {
        parenDepth += 1; statementComplete = false; prevWhitespace = false
      } else if (c == ')') {
        if (parenDepth > 0) parenDepth -= 1 else unbalanced = true
        statementComplete = false; prevWhitespace = false
      } else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        if (statementComplete && prevWhitespace) {
          commentLine = true
          start = i
        } else {
          partialComment = true
        }
        prevWhitespace = false
      } else if (c == ';') {
        val stmtText = text.substring(start, i + 1)
        if (CopyStdin.matches(stmtText.trim)) {
          // pg_dump's default data format: the statement opens a block
          // of raw tab-separated lines terminated by a lone `\.` line.
          // Data lines are opaque (may contain quotes, semicolons,
          // parens) — scan straight to the terminator and emit ONE
          // CopyBlock statement.
          var term = text.indexOf("\n\\.", i)
          while (term >= 0 && term + 3 < n && text.charAt(term + 3) != '\n' && text.charAt(term + 3) != '\r')
            term = text.indexOf("\n\\.", term + 1)
          val end = if (term < 0) n else term + 3
          sink(StatementKind.CopyBlock, start, end, term >= 0, term >= 0)
          start = end
          i = end - 1
        } else {
          sink(StatementKind.Other, start, i + 1,
            parenDepth == 0 && !unbalanced, true)
          start = i + 1
        }
        parenDepth = 0; unbalanced = false
        statementComplete = true
        prevWhitespace = false
      } else if (c == '\n' || c == ' ' || c == '\t' || c == '\r') {
        prevWhitespace = true
      } else {
        prevWhitespace = false
        statementComplete = false
      }
      i += 1
    }
    if (start < n) {
      if (commentLine) sink(StatementKind.CommentLine, start, n, true, false)
      else if (!statementComplete)
        sink(StatementKind.Other, start, n,
          parenDepth == 0 && !unbalanced && !inQuote && dollarTag == null, false)
      // trailing whitespace-only → nothing
    }
  }

  private def emit(
      b: scala.collection.mutable.Builder[Raw, Vector[Raw]],
      kind: String,
      text: String,
      valid: Boolean): Unit = {
    val trimmed = text.trim
    if (trimmed.nonEmpty) {
      val k =
        if (kind == StatementKind.CommentLine || kind == StatementKind.CopyBlock) kind
        else classify(trimmed)
      b += Raw(k, trimmed, valid)
    }
  }

  /** `COPY db.table (cols) FROM stdin [WITH …];` — the block-opening
    * statement. The table name may be quoted (even with spaces) and
    * options may follow `stdin`, so the match is anchored on the COPY
    * head and the FROM stdin tail rather than a rigid token shape.
    */
  private[ingest] val CopyStdin =
    """(?is)COPY\s+.+\bFROM\s+stdin\b[^;]*;""".r

  /** S7: row classifier — reference `get_row_type`
    * (`replibyte/src/source/postgres.rs:448-497`), including the
    * `ALTER TABLE ONLY` offset handling.
    */
  def classify(stmt: String): String = {
    val upper = firstWords(stmt, 3).map(_.toUpperCase)
    upper match {
      case Seq("INSERT", "INTO", _*) => StatementKind.InsertInto
      case Seq("CREATE", "TABLE", _*) => StatementKind.CreateTable
      case Seq("ALTER", "TABLE", _*) => StatementKind.AlterTable
      case _ if stmt.startsWith("--") => StatementKind.CommentLine
      case _ => StatementKind.Other
    }
  }

  /** Extract the `(database, table)` of an INSERT/CREATE/ALTER statement;
    * unqualified names default to schema "public" (reference keys its
    * transformer map `db.table.column`, `source/postgres.rs:229-237`).
    */
  def tableRef(stmt: String): Option[(String, String)] = {
    val words = firstWords(stmt, 6)
    val upper = words.map(_.toUpperCase)
    val nameIdx = upper match {
      case Seq("INSERT", "INTO", _*) => Some(2)
      case Seq("CREATE", "TABLE", "IF", "NOT", "EXISTS", _*) => Some(5)
      case Seq("CREATE", "TABLE", _*) => Some(2)
      case Seq("ALTER", "TABLE", "ONLY", _*) => Some(3)
      case Seq("ALTER", "TABLE", _*) => Some(2)
      case Seq("COPY", _*) => Some(1)
      case _ => None
    }
    nameIdx.flatMap(words.lift).map { raw =>
      val name = truncAtTerminator(raw)
      val parts = splitQualified(name).map(unquoteIdent)
      if (parts.length >= 2) (parts(0), parts(1)) else ("public", parts(0))
    }
  }

  /** Like [[tableRef]] but reports whether the statement EXPLICITLY
    * schema-qualified the name: `CREATE TABLE public.t` → (Some(public),
    * t) while the unqualified `CREATE TABLE t` (mysqldump's shape — the
    * session database decides) → (None, t). Restore legs need the
    * distinction: an unqualified name follows the destination's
    * default namespace, an explicit foreign one must not be replayed
    * verbatim into a destination that resolves it differently.
    */
  def tableRefExplicit(stmt: String): Option[(Option[String], String)] = {
    val words = firstWords(stmt, 6)
    val upper = words.map(_.toUpperCase)
    val nameIdx = upper match {
      case Seq("INSERT", "INTO", _*) => Some(2)
      case Seq("CREATE", "TABLE", "IF", "NOT", "EXISTS", _*) => Some(5)
      case Seq("CREATE", "TABLE", _*) => Some(2)
      case Seq("ALTER", "TABLE", "ONLY", _*) => Some(3)
      case Seq("ALTER", "TABLE", _*) => Some(2)
      case Seq("COPY", _*) => Some(1)
      case _ => None
    }
    nameIdx.flatMap(words.lift).map { raw =>
      val name = truncAtTerminator(raw)
      val parts = splitQualified(name).map(unquoteIdent)
      if (parts.length >= 2) (Some(parts(0)), parts(1)) else (None, parts(0))
    }
  }

  /** Cut a name token at the first '(' or ';' OUTSIDE quotes — a
    * quoted identifier may itself contain parens (`"items(2024)"`),
    * which must stay part of the name (r19 review).
    */
  private def truncAtTerminator(raw: String): String = {
    var q: Char = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '`') q = c
      else if (c == '(' || c == ';') return raw.substring(0, i)
      i += 1
    }
    raw
  }

  /** Split a possibly-qualified identifier on dots OUTSIDE quotes only:
    * `CREATE TABLE "my.schema"."t"` names schema `my.schema`, not `my`
    * — a dot inside `"…"`/`` `…` `` is part of the identifier. A
    * doubled closing quote (`"a""b"`) re-enters the quoted state at the
    * reopening quote, so its inner dots stay protected too.
    */
  private[ingest] def splitQualified(name: String): Vector[String] = {
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var q: Char = 0
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (q != 0) { cur.append(c); if (c == q) q = 0 }
      else if (c == '"' || c == '`') { cur.append(c); q = c }
      else if (c == '.') { parts += cur.result(); cur.clear() }
      else cur.append(c)
      i += 1
    }
    parts += cur.result()
    parts.result()
  }

  def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '`' && t.last == '`')))
      t.substring(1, t.length - 1)
    else t
  }

  private def firstWords(s: String, k: Int): Seq[String] = {
    val b = Seq.newBuilder[String]
    var i = 0
    var count = 0
    val n = s.length
    while (i < n && count < k) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      val start = i
      // a word ends at whitespace OUTSIDE quotes: a quoted identifier
      // counts as one word even with inner spaces, including a quoted
      // segment entered mid-word (`"my.schema"."my table"` is ONE word)
      var q: Char = 0
      while (i < n && (q != 0 || !s.charAt(i).isWhitespace)) {
        val c = s.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '"' || c == '`') q = c
        i += 1
      }
      if (i > start) { b += s.substring(start, i); count += 1 }
    }
    b.result()
  }
}
