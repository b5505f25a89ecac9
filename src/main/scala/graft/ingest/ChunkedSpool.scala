package graft.ingest

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Chunked SQL spool: streams a tool dump (pg_dump / mysqldump stdout)
  * into `part-%05d.sql` files rolled at STATEMENT boundaries once a
  * part passes `chunkBytes` — the reference chunks its dump stream at
  * 100 MB the same way (`tasks/full_dump.rs:72-77`, on query
  * boundaries). The payoff is parse parallelism: a single-file spool is
  * one whole-file task in [[DumpReader.statements]], so a 100 GB dump
  * would parse on one executor thread; a directory of parts parses one
  * task per part, and only this light boundary scan stays on the
  * driver (the reference's single CPU does ALL of its parsing there).
  *
  * Memory bound: O(chunkBytes + largest statement). The tool legs force
  * per-row statements (`pg_dump --column-inserts`, reference-exact —
  * `source/postgres.rs:85-95`), so "largest statement" is one row. A
  * COPY-format dump piped through `dump create -i` counts each whole
  * `COPY … FROM stdin` block as one statement (boundaries only between
  * blocks), so its bound is the largest single table's block — the
  * same bound the whole-file splitter has, just per part.
  *
  * Boundary discipline: cuts only at [[StatementSplitter
  * .lastCompleteBoundary]] under the TOOL's declared dialect, computed
  * over an ISO-8859-1 view so the offset is a BYTE offset and the
  * original bytes pass through verbatim (any encoding, valid UTF-8 or
  * not); a cut lands right after an ASCII terminator byte, so a UTF-8
  * multibyte sequence is never split; every part therefore re-splits
  * independently to exactly the statements of the unchunked stream —
  * the invariant PropertySpec pins for the chunk/dialect floor. The
  * first part carries the dump's own header (the dialect marker for
  * pg dumps), later parts are headerless chunk siblings, exactly the
  * shape DumpReader's dialect floor was built for.
  */
object ChunkedSpool {

  val DefaultChunkBytes: Int = 100 * 1024 * 1024

  /** Run `writeTo` against a chunking stream; each rolled part is
    * opened via `newPart(index)` (the caller owns naming/placement).
    * Returns the number of parts written (≥1 — an empty dump still
    * writes one empty part so downstream listing finds the spool).
    * `pg`: the string-literal dialect when the caller knows the tool
    * (pg_dump/mysqldump legs); None detects it from the stream's own
    * header at the first roll — the same pre-data-marker rule
    * DumpReader's dialect floor applies on read (`dump create -i`
    * pipes, where the tool is unknown).
    */
  def write(newPart: Int => OutputStream, pg: Option[Boolean],
            chunkBytes: Int = DefaultChunkBytes)(
            writeTo: OutputStream => Unit): Int = {
    var dialect = pg
    val buf = new ByteArrayOutputStream(64 * 1024)
    var parts = 0
    // a failed boundary scan (statement still open at chunkBytes) must
    // not repeat per write: rescan only after the buffer grows by ~1/8
    // of its scanned size (geometric), or the overlong-statement worst
    // case turns O(n²) in full-buffer scans — geometric steps keep the
    // total bytes scanned linear in the stream
    var nextScanAt = chunkBytes
    def openPart(): OutputStream = { val o = newPart(parts); parts += 1; o }

    def rollIfDue(): Unit = if (buf.size() >= nextScanAt) {
      val bytes = buf.toByteArray
      // cut candidates end at a newline byte: '\n' is ASCII, so the
      // prefix before it is always complete UTF-8
      var nl = bytes.length - 1
      while (nl >= 0 && bytes(nl) != '\n') nl -= 1
      var rolled = false
      if (nl > 0) {
        // scan on an ISO-8859-1 decode: one byte == one char, so the
        // boundary offset IS a byte offset and the original bytes are
        // written verbatim — a UTF-8 decode would map invalid bytes
        // (latin1/SQL_ASCII dumps, raw blob bytes) to U+FFFD and the
        // re-encoded cut would shift/drop real bytes (r19 review). The
        // scan itself only keys on ASCII chars (quotes, backslash,
        // semicolon, newline, '$'), which ISO-8859-1 maps identically;
        // multibyte UTF-8 sequences decode to high chars the state
        // machine treats as opaque content, same as a UTF-8 decode.
        val text = new String(bytes, 0, nl + 1, java.nio.charset.StandardCharsets.ISO_8859_1)
        val d = dialect.getOrElse {
          val v = StatementSplitter.pgStrings(text) &&
            !StatementSplitter.mysqlHeader(text)
          dialect = Some(v)
          v
        }
        val b = StatementSplitter.lastCompleteBoundary(text, Some(d))
        if (b > 0) {
          val o = openPart()
          try o.write(bytes, 0, b) finally o.close()
          buf.reset()
          buf.write(bytes, b, bytes.length - b)
          rolled = true
        }
      }
      // no newline / no complete statement yet: keep buffering — the
      // next writes will complete the statement
      nextScanAt = if (rolled) chunkBytes
        else buf.size() + math.max(buf.size() / 8, 64)
    }

    val chunking = new OutputStream {
      override def write(b: Int): Unit = { buf.write(b); rollIfDue() }
      override def write(bs: Array[Byte], off: Int, len: Int): Unit = {
        var o = off
        var l = len
        while (l > 0) {
          val n = math.min(l, math.max(nextScanAt - buf.size(), 1))
          buf.write(bs, o, n)
          o += n
          l -= n
          rollIfDue()
        }
      }
    }
    writeTo(chunking)
    // the tail (and an empty stream's zero bytes) lands as the final
    // part, complete or not — the consumer's splitter sees the same
    // trailing bytes it would have seen in a single file. A stream
    // that ended exactly on a roll boundary has nothing buffered: skip
    // the part then (ADVICE r19 — the unconditional open wrote a
    // zero-byte trailing part, inflating part/parse-task counts). The
    // parts ≥ 1 guarantee stays for the truly empty stream, so
    // downstream listing still finds the spool.
    if (parts == 0 || buf.size() > 0) {
      val o = openPart()
      try o.write(buf.toByteArray) finally o.close()
    }
    parts
  }
}
