package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed (pre-shuffled, pre-sorted) table support — the co-location
  * lever for repeated joins at 100 TB: pay the shuffle ONCE at write
  * time, then every later join or aggregation on the bucket key runs
  * with zero Exchange nodes (`PlanSpec` asserts this on the executed
  * plan of `j6_bucketed_join`).
  *
  * The reference re-reads its dump per operation with no physical
  * layout control (`datastore/mod.rs` stores opaque chunk blobs); on
  * Spark the idiomatic upgrade is `bucketBy(n, key).sortBy(key)`: both
  * sides of an equi-join bucketed into the same `n` on the join key
  * sort-merge-join bucket-to-bucket with no shuffle and no sort.
  *
  * Scale notes:
  *   - bucket count is a LAYOUT constant, decoupled from
  *     `spark.sql.shuffle.partitions` — size it so one bucket of the
  *     big table fits an executor core's memory at target scale
  *     (hundreds-to-thousands at 100 TB, 8 in the local tests);
  *   - bucket metadata lives in the session catalog. Local runs use
  *     the in-memory catalog (per-session); production points the same
  *     code at a persistent metastore so the layout survives restarts.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by
    * `key` — one shuffle now, none on any later `key`-equi-join or
    * `key`-groupBy against it.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Composite-key variant: bucket and sort by `keys` together. A later
    * equi-join whose keys include ALL of `keys` reads the table
    * bucket-to-bucket, pre-sorted, with zero Exchange on this side —
    * the layout lever behind the persisted LSH index
    * (`Dedup.buildLshIndex` bucketed on (band, bucket), asserted
    * shuffle-free in `OpsSpec`).
    *
    * What the layout buys, precisely: the equi-join always runs with
    * ZERO Exchange on this side. The read-side Sort is additionally
    * elided only when (a) each bucket holds exactly one file AND
    * (b) `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * (off by default since Spark 3.1 — reporting the ordering requires
    * listing files at planning time). `repartition(buckets, keys)`
    * before the write guarantees (a): `HashPartitioning`'s
    * `pmod(murmur3, n)` is the same function bucketing uses, so each
    * task holds exactly one bucket's rows and writes its single file —
    * which also prevents the per-(task, bucket) small-file explosion a
    * multi-partition df would otherwise write. The extra exchange is
    * part of the "pay the shuffle once at write time" contract;
    * OpsSpec asserts the scan reports a non-empty outputOrdering under
    * the conf.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(buckets > 0, "bucket count must be positive")
    require(keys.nonEmpty, "at least one bucket key required")
    df.repartition(buckets, keys.map(df.col): _*)
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Identity of the last [[writeBucketedOnce]] per table name —
    * process-scoped because bucket metadata itself lives in the
    * session catalog (in-memory locally, a metastore in production),
    * so a new JVM starts with an empty catalog and rebuilds anyway.
    */
  private val builtIdentity =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Pay-once variant: (re)write the bucketed layout only when the
    * catalog doesn't hold `table` built from this exact `identity`
    * (caller-supplied data-identity string — `ArtifactCache
    * .sourceIdentity` of the source files). The bucketed layout is an
    * INGEST artifact: at 100 TB the whole point is paying the shuffle
    * once and joining shuffle-free forever after, so a bench pass (or
    * any repeated job in one session) must measure the join, not a
    * rewrite of the layout. A changed identity (re-provisioned source)
    * rebuilds — same staleness contract as ArtifactCache.
    */
  def writeBucketedOnce(df: DataFrame, table: String, keys: Seq[String],
                        buckets: Int, identity: String): Unit = {
    val key = s"$identity|${keys.mkString(",")}|$buckets"
    // atomic per table: a bare check-then-act would let two concurrent
    // callers race SaveMode.Overwrite on the same managed table.
    // ConcurrentHashMap.compute serializes per key, so the build runs
    // once and the loser reuses it; builds of DIFFERENT tables still
    // proceed in parallel.
    builtIdentity.compute(table, (_, prev) => {
      if (!(prev == key && df.sparkSession.catalog.tableExists(table)))
        writeBucketed(df, table, keys, buckets)
      key
    })
    ()
  }
}
