package graft.ingest

import org.apache.spark.sql.types._

/** Live PostgreSQL legs via the native client tools, mirroring the
  * reference exactly: the source spawns `pg_dump --column-inserts
  * --no-owner` and parses its stdout (reference
  * `source/postgres.rs:93-151`), the destination pipes SQL text into
  * `psql`'s stdin with an optional schema wipe first (reference
  * `destination/postgres.rs:40-110`). The password travels in
  * PGPASSWORD (env, never argv — `ps` would show an argument).
  *
  * These are the DRIVER-side single-stream legs, same inherent bound
  * as the reference: one tool process, one pipe. The engine's default
  * Postgres path is the partitioned JDBC scan ([[Jdbc]]) — distributed
  * and strictly faster at scale — but it needs a JDBC driver jar on
  * the classpath; the tool legs need only the ubiquitous client
  * binaries, so they are the fallback (and the reference-exact
  * behavior) when no driver is present. The dump STREAM is spooled to
  * a file and everything downstream is the distributed `--file` dump
  * path, so only the pipe itself is driver-bound.
  *
  * Connection pieces come from [[Conn]], parsed off the same
  * `jdbc:postgresql://host:port/db?params` URL the JDBC leg uses. A
  * libpq-style `host=` query param overrides the -h value — that is
  * how a unix-socket DIRECTORY is named (URIs cannot carry a path as
  * their authority), e.g. `postgres://u@localhost/db?host=/tmp/sock`.
  */
object PgLive {

  /** Connection endpoint for the tools. */
  final case class Conn(host: String, port: Int, db: String,
                        user: Option[String], password: Option[String]) {
    private[ingest] def hostArgs: Seq[String] =
      Seq("-h", host, "-p", port.toString) ++ user.toSeq.flatMap(u => Seq("-U", u))
    private[ingest] def env: Map[String, String] =
      password.map("PGPASSWORD" -> _).toMap
  }

  object Conn {
    /** Parse `jdbc:postgresql://host:port/db?params` (the form
      * `JdbcConnection.parse` normalizes every postgres:// URI to).
      */
    def fromJdbcUrl(url: String, user: Option[String],
                    password: Option[String]): Conn = {
      require(url.startsWith("jdbc:postgresql://"),
        s"not a postgresql JDBC URL: $url")
      val u = new java.net.URI(url.stripPrefix("jdbc:"))
      val db = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(s"no database in $url"))
      val params = Option(u.getRawQuery).getOrElse("").split("&").iterator
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      // libpq convention: host= in the params (a unix-socket dir or an
      // override) wins over the URI authority
      val host = params.getOrElse("host",
        Option(u.getHost).getOrElse("localhost"))
      Conn(host, if (u.getPort == -1) 5432 else u.getPort, db, user, password)
    }
  }

  /** pg_dump argument vector (reference source/postgres.rs:121-143):
    * `--column-inserts` = INSERT-per-row with column names (exactly the
    * statement shape [[InsertParser]] consumes), `--no-owner` = skip
    * ownership DDL. only_tables push down as `--table=` patterns, like
    * the reference's `--table={db}.{table}`.
    */
  def dumpArgs(c: Conn, onlyTables: Seq[String] = Nil): Seq[String] =
    Seq("--column-inserts", "--no-owner") ++ c.hostArgs ++
      onlyTables.map(t => s"--table=$t") ++ Seq(c.db)

  /** psql argument vector (reference destination/postgres.rs:80-95). */
  def restoreArgs(c: Conn): Seq[String] =
    c.hostArgs ++ Seq("-d", c.db, "-v", "ON_ERROR_STOP=1")

  /** The reference's wipe-before-restore statement
    * (destination/postgres.rs:100-110): drop + recreate the public
    * schema so a re-run restores into emptiness instead of colliding
    * with (or silently doubling) the previous restore's rows.
    */
  def wipeQuery(user: String): String =
    s"""DROP SCHEMA public CASCADE; CREATE SCHEMA public; """ +
      s"""GRANT ALL ON SCHEMA public TO "$user"; GRANT ALL ON SCHEMA public TO public;"""

  /** Dump the live database, spooling the tool's stdout straight into a
    * caller-opened sink — O(copy buffer) driver memory; the spooled
    * file then feeds the DISTRIBUTED dump-file pipeline.
    */
  def dumpToStream(c: Conn, out: java.io.OutputStream,
                   onlyTables: Seq[String] = Nil,
                   cmd: Seq[String] = Seq("pg_dump")): Unit = {
    MongoLive.runTo(cmd ++ dumpArgs(c, onlyTables), _ => (), out, c.env)
    ()
  }

  /** Restore by STREAMING SQL text into psql's stdin: `write` produces
    * statements chunk-by-chunk straight into the pipe (never the whole
    * dump on the driver). `wipe` first drops + recreates the public
    * schema in its own psql invocation, exactly like the reference's
    * `init()` (destination/postgres.rs:40-68). ON_ERROR_STOP makes a
    * failed statement fail the restore loudly instead of psql's
    * default keep-going.
    */
  def restore(c: Conn, write: java.io.OutputStream => Unit,
              wipe: Boolean, cmd: Seq[String] = Seq("psql")): Unit = {
    if (wipe) {
      MongoLive.run(
        cmd ++ c.hostArgs ++ Seq("-d", c.db, "-c", wipeQuery(c.user.getOrElse("postgres"))),
        _ => (), c.env)
      ()
    }
    MongoLive.run(cmd ++ restoreArgs(c), write, c.env)
    ()
  }

  /** Restore with PER-TABLE PARALLEL COPY (r19 verdict #5): one psql
    * pipe replays the wipe + ALL DDL first, then each table's data
    * streams through its OWN psql connection, at most `parallelism`
    * concurrently — the shape of pg_restore's `-j`. The single pipe's
    * ~58k rows/s is the TOOL's bound, not Spark's: tables are
    * independent rows-wise, so N pipes multiply the floor until the
    * server's write path saturates. Safe without ordering because this
    * leg replays per-table CREATEs only — FK constraints are not among
    * them (pg_dump itself adds constraints AFTER data for exactly this
    * reason), so no data pipe can observe a half-loaded parent. A
    * failed table fails the restore loudly: every pipe is awaited,
    * the first failure is primary and later ones attach as suppressed.
    */
  def restoreParallel(c: Conn, ddl: java.io.OutputStream => Unit,
                      tables: Seq[(String, java.io.OutputStream => Unit)],
                      wipe: Boolean, cmd: Seq[String] = Seq("psql"),
                      parallelism: Int = 4): Unit = {
    restore(c, ddl, wipe, cmd)
    val n = math.max(1, math.min(parallelism, tables.size))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n, r => {
      val t = new Thread(r, "graft-pg-restore")
      t.setDaemon(true)
      t
    })
    try {
      val futs = tables.map { case (t, write) =>
        t -> pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = restore(c, write, wipe = false, cmd)
        })
      }
      var primary: Throwable = null
      futs.foreach { case (t, f) =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            val cause = Option(e.getCause).getOrElse(e)
            val wrapped = new RuntimeException(s"restore of table $t failed", cause)
            if (primary == null) primary = wrapped else primary.addSuppressed(wrapped)
        }
      }
      if (primary != null) throw primary
    } finally pool.shutdown()
  }

  /** Double-quoted identifier (`""` doubling) — the restore stream
    * quotes every identifier it synthesizes so camelCase or
    * reserved-word source columns (which pg_dump emits quoted and the
    * parser unquotes into the frame) survive the server's case-folding
    * parser on the way back.
    */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** `CREATE TABLE` DDL from a frame schema — the psql leg restores
    * into a freshly wiped schema, so the tables must be declared before
    * the COPY stream (the JDBC leg gets this from Spark's writer; the
    * type mapping below mirrors it). Identifiers are quoted — see
    * [[quoteIdent]]; the COPY header quotes the same way, so the
    * declared and targeted column names always agree.
    */
  def createTableSql(table: String, schema: StructType): String = {
    def pg(dt: DataType): String = dt match {
      case ByteType | ShortType => "smallint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case FloatType => "real"
      case DoubleType => "double precision"
      case d: DecimalType => s"numeric(${d.precision},${d.scale})"
      case BooleanType => "boolean"
      case DateType => "date"
      case _: TimestampType => "timestamp"
      case BinaryType => "bytea"
      case _ => "text"
    }
    // IF NOT EXISTS so a wipe=false restore APPENDS into existing
    // tables (the JDBC leg's SaveMode.Append analog) instead of dying
    // on the DDL under ON_ERROR_STOP
    val target = table.split('.').map(quoteIdent).mkString(".")
    schema.fields.map(f => s"${quoteIdent(f.name)} ${pg(f.dataType)}")
      .mkString(s"CREATE TABLE IF NOT EXISTS $target (", ", ", ");")
  }
}
