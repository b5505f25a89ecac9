package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) corpus exchange — the interchange
  * format of LLM corpus tooling (crawl dumps, filtered shards,
  * The Pile / RedPajama-style releases all ship as JSONL, usually
  * gzipped). Spark's native json datasource does the heavy lifting:
  * codegen'd Jackson parse, splittable uncompressed files, per-file
  * parallelism for gzip (a .gz file is one task — shard accordingly).
  *
  * The deliberate constraints are the scale contract:
  *   - reads REQUIRE an explicit schema: schema inference is a full
  *     extra pass over the data (100 TB read twice) and type-unstable
  *     across shards — a corpus exchange has a declared schema;
  *   - `columnNameOfCorruptRecord` surfaces malformed lines as a
  *     `_corrupt` column instead of silently nulling every field, so
  *     ingest jobs can count/quarantine them (the
  *     count-don't-crash posture of a multi-day 100 TB load); pass
  *     `failFast = true` to abort on the first bad line instead.
  */
object Jsonl {

  /** Write `df` as JSONL under `path`, one file per partition.
    * `compression`: "none", "gzip", "bzip2", "deflate" — gzip for
    * exchange, none when downstream wants splittable files.
    */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read JSONL under `path` with the declared `schema`. Malformed
    * lines populate only the `_corrupt` column (add it to the schema
    * via [[withCorruptColumn]]) unless `failFast`.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           failFast: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)

  /** Streaming read of a watched JSONL directory — the continuous
    * ingest form: new files landing under `path` become micro-batches,
    * the checkpoint remembers which files were consumed, and an
    * availableNow trigger processes the backlog then stops (the
    * reference's bounded one-pass semantics; leave the trigger default
    * for a long-running watcher). Same declared-schema contract as
    * [[read]].
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  val CorruptColumn = "_corrupt"

  /** The declared schema plus the corrupt-record column — what a
    * quarantining ingest passes to [[read]].
    */
  def withCorruptColumn(schema: StructType): StructType =
    schema.add(CorruptColumn, org.apache.spark.sql.types.StringType)
}
