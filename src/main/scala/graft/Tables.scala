package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory at call time so the same
  * plan runs against sf0.001 → sf0.1 locally and a 100 TB lake in
  * production — nothing here hard-codes a path or collects to the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any realistic scale factor
    * (TPC-H dims: region is 5 rows, nation 25 — fixed regardless of SF).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")

  /** `events.ts` arrives in two parquet flavors depending on the data
    * generator: TIMESTAMP(NANOS), which Spark only reads as a long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set in every graft
    * session), or TIMESTAMP(MICROS) without timezone, which Spark reads
    * natively as TIMESTAMP_NTZ. Branch on the loaded dtype and
    * normalize both to a session-timezone (UTC) microsecond timestamp —
    * DuckDB also holds timestamps at microsecond precision, so oracle
    * comparisons agree either way.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = load(spark, sfDir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType => timestamp_micros((col("ts") / 1000L).cast("long"))
      case _: TimestampNTZType | _: TimestampType => col("ts").cast(TimestampType)
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet dtype $other")
    }
    raw.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

/** One place to build a correctly-configured session for local runs and
  * tests. AQE on (runtime re-plan, skew-join handling), shuffle
  * partitions sized to cores not the 200 default — at cluster scale the
  * same code relies on AQE coalescing instead of a hand-tuned constant.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]") = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      // managed-table home for bucketed layouts (ops.Bucketing) —
      // per-process so concurrent test/bench/verify JVMs never race on
      // the same table directory; production replaces this with a real
      // warehouse + persistent metastore
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
