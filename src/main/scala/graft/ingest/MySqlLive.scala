package graft.ingest

import org.apache.spark.sql.types._

/** Live MySQL legs via the native client tools, mirroring the
  * reference: the source spawns `mysqldump --skip-extended-insert
  * --complete-insert …` and parses its stdout (reference
  * `source/mysql.rs:100-163` — per-row INSERTs with column names,
  * exactly the statement shape [[InsertParser]] consumes), the
  * destination pipes SQL text into the `mysql` client's stdin
  * (reference `destination/mysql.rs:59-79`). One deliberate
  * divergence: the password travels in MYSQL_PWD (env) rather than the
  * reference's `-p<password>` argv, which any `ps` on the host would
  * display — same env-not-argv rule as the PGPASSWORD leg.
  *
  * Same posture as [[PgLive]]: driver-side single-stream tool legs
  * (the reference's own mechanism and the no-driver-jar fallback); the
  * spooled dump feeds the DISTRIBUTED dump-file pipeline, so only the
  * pipe itself is driver-bound. The partitioned-JDBC scan stays the
  * engine's default/scale path.
  */
object MySqlLive {

  /** Connection endpoint for the tools. */
  final case class Conn(host: String, port: Int, db: String,
                        user: Option[String], password: Option[String]) {
    private[ingest] def hostArgs: Seq[String] =
      Seq("-h", host, "-P", port.toString) ++ user.toSeq.flatMap(u => Seq("-u", u))
    private[ingest] def env: Map[String, String] =
      password.map("MYSQL_PWD" -> _).toMap
  }

  object Conn {
    /** Parse `jdbc:mysql://host:port/db?params` (the form
      * `JdbcConnection.parse` normalizes every mysql:// URI to).
      */
    def fromJdbcUrl(url: String, user: Option[String],
                    password: Option[String]): Conn = {
      require(url.startsWith("jdbc:mysql://"), s"not a mysql JDBC URL: $url")
      val u = new java.net.URI(url.stripPrefix("jdbc:"))
      val db = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(s"no database in $url"))
      Conn(Option(u.getHost).getOrElse("localhost"),
        if (u.getPort == -1) 3306 else u.getPort, db, user, password)
    }
  }

  /** mysqldump argument vector (reference source/mysql.rs:110-144,
    * same flag set and ordering): per-row complete INSERTs, streaming
    * reads (`--quick`), hex blobs; skip_tables push down as
    * `--ignore-table=db.table`, only_tables as the positional table
    * list after the database.
    */
  def dumpArgs(c: Conn, skipTables: Seq[String] = Nil,
               onlyTables: Seq[String] = Nil): Seq[String] =
    c.hostArgs ++ Seq(
      "--add-drop-database", "--add-drop-table", "--skip-extended-insert",
      "--complete-insert", "--single-transaction", "--quick", "--hex-blob",
      c.db) ++
      skipTables.map(t => s"--ignore-table=${c.db}.$t") ++ onlyTables

  /** mysql client argument vector (reference destination/mysql.rs:61-71). */
  def restoreArgs(c: Conn): Seq[String] = c.hostArgs ++ Seq(c.db)

  /** Dump the live database, spooling the tool's stdout straight into a
    * caller-opened sink — O(copy buffer) driver memory; the spooled
    * file then feeds the DISTRIBUTED dump-file pipeline.
    */
  def dumpToStream(c: Conn, out: java.io.OutputStream,
                   skipTables: Seq[String] = Nil, onlyTables: Seq[String] = Nil,
                   cmd: Seq[String] = Seq("mysqldump")): Unit = {
    MongoLive.runTo(cmd ++ dumpArgs(c, skipTables, onlyTables), _ => (), out, c.env)
    ()
  }

  /** Restore by STREAMING SQL text into the mysql client's stdin —
    * `write` produces statements chunk-by-chunk straight into the pipe
    * (never the whole dump on the driver). The reference has no
    * wipe query for MySQL (its dumps carry `--add-drop-table`); our
    * synthesized restore stream gets the same idempotency from the
    * caller emitting DROP TABLE IF EXISTS before each CREATE.
    */
  def restore(c: Conn, write: java.io.OutputStream => Unit,
              cmd: Seq[String] = Seq("mysql")): Unit = {
    MongoLive.run(cmd ++ restoreArgs(c), write, c.env)
    ()
  }

  /** Backtick-quoted identifier (`` ` `` doubling) — mysqldump's own
    * convention; the restore stream quotes every identifier it
    * synthesizes so reserved-word source columns survive the server's
    * parser.
    */
  def quoteIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** `CREATE TABLE` DDL from a frame schema, MySQL dialect (BLOB not
    * bytea, DATETIME not timestamp-without-zone). Identifiers are
    * backtick-quoted — see [[quoteIdent]]; the extended-INSERT stream
    * quotes the same way.
    */
  def createTableSql(table: String, schema: StructType): String = {
    def my(dt: DataType): String = dt match {
      case ByteType | ShortType => "smallint"
      case IntegerType => "int"
      case LongType => "bigint"
      case FloatType => "float"
      case DoubleType => "double"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case BooleanType => "boolean"
      case DateType => "date"
      case _: TimestampType => "datetime"
      case BinaryType => "blob"
      case _ => "text"
    }
    val target = table.split('.').map(quoteIdent).mkString(".")
    schema.fields.map(f => s"${quoteIdent(f.name)} ${my(f.dataType)}")
      .mkString(s"CREATE TABLE IF NOT EXISTS $target (", ", ", ");")
  }
}
