package graft.ingest

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.FkEdge

/** S1/S2 + D1/D2: live-database scan and restore over JDBC — the
  * idiomatic Spark replacement for the reference's `pg_dump`/
  * `mysqldump` subprocess sources (`source/postgres.rs:113-170`,
  * `source/mysql.rs:101-163`) and `psql`/`mysql` stdin destinations
  * (`destination/postgres.rs:76-113`, `mysql.rs:58-80`).
  *
  * Scale posture: reads are partitioned on a numeric column when one is
  * given (`numPartitions` concurrent range queries instead of one
  * serial dump stream); catalog/FK metadata calls are driver-side and
  * touch only `java.sql.DatabaseMetaData`, never data. Writes go
  * through Spark's batched JDBC sink (one connection per partition).
  */
object Jdbc {

  /** Table names of a schema — reference `Explain::schema` table
    * enumeration (`source/postgres.rs:78-111`), via JDBC metadata.
    */
  def tableNames(url: String, schema: Option[String] = None,
                 creds: Map[String, String] = Map.empty): Seq[String] = {
    val conn = DriverManager.getConnection(url, toProperties(creds))
    try listTables(conn.getMetaData, schema)
    finally conn.close()
  }

  /** `schema` is a LIKE pattern in `getTables` — escape `_`/`%` so
    * `app_data` doesn't also enumerate `app1data`'s tables.
    */
  private def listTables(meta: java.sql.DatabaseMetaData, schema: Option[String]): Seq[String] = {
    val esc = meta.getSearchStringEscape
    val pattern = schema.map(_
      .replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%"))
    val rs = meta.getTables(null, pattern.orNull, "%", Array("TABLE"))
    val b = Seq.newBuilder[String]
    while (rs.next()) b += rs.getString("TABLE_NAME")
    b.result().sorted
  }

  /** S10 live mode: the FK edge list from `DatabaseMetaData
    * .getImportedKeys` — the JDBC-standard face of the reference's
    * `information_schema` reads (`subset/src/postgres.rs:662-734` parses
    * the same constraints out of dump text). One connection serves both
    * the table listing and the per-table key reads.
    */
  def foreignKeys(url: String, schema: Option[String] = None,
                  creds: Map[String, String] = Map.empty): Seq[FkEdge] = {
    val conn = DriverManager.getConnection(url, toProperties(creds))
    try {
      val meta = conn.getMetaData
      listTables(meta, schema).flatMap { t =>
        // getImportedKeys takes an exact schema name, not a pattern
        val rs = meta.getImportedKeys(null, schema.orNull, t)
        val b = Seq.newBuilder[FkEdge]
        while (rs.next()) b += FkEdge(
          Option(rs.getString("FKTABLE_SCHEM")).getOrElse(""),
          rs.getString("FKTABLE_NAME"),
          rs.getString("FKCOLUMN_NAME"),
          Option(rs.getString("PKTABLE_SCHEM")).getOrElse(""),
          rs.getString("PKTABLE_NAME"),
          rs.getString("PKCOLUMN_NAME"))
        b.result()
      }
    } finally conn.close()
  }

  /** Read one table, optionally as `numPartitions` parallel range
    * scans on `partitionColumn` (bounds come from one driver-side
    * MIN/MAX query). An empty table falls back to a single scan.
    */
  def readTable(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      driver: Option[String] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    def base = {
      val r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
        .options(options)
      driver.fold(r)(d => r.option("driver", d))
    }
    partitionColumn match {
      case Some(c) =>
        val bounds = base
          .option("dbtable", s"(SELECT MIN($c) AS mn, MAX($c) AS mx FROM $table) AS b")
          .load().head()
        if (bounds.isNullAt(0)) base.load()
        else base
          .option("partitionColumn", c)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", numPartitions)
          .load()
      case None => base.load()
    }
  }

  /** D1/D2: batched write into a destination table. */
  def writeTable(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Append,
      driver: Option[String] = None,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).format("jdbc")
      .option("url", url).option("dbtable", table).options(options)
    driver.fold(w)(d => w.option("driver", d)).save()
  }

  private def toProperties(m: Map[String, String]): java.util.Properties = {
    val p = new java.util.Properties()
    m.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Driver-side DDL/utility statement — the wipe step of a restore
    * (`destination/postgres.rs:100-110`) and test fixture setup.
    */
  def execute(url: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }
}
