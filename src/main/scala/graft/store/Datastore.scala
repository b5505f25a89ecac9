package graft.store

import java.io.ByteArrayOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.model.DumpMeta

/** D6/D7: the chunked dump datastore.
  *
  * Reference behavior (`tasks/full_dump.rs:72-110`, `datastore/
  * local_disk.rs:111-210`, `s3.rs:213-352`): buffer statements into
  * ≤`chunkBytes` chunks, compress → encrypt, write each as
  * `<dump>/<part>.dump`, maintain `metadata.json`.
  *
  * Spark-first: each partition writes its own part files through the
  * Hadoop FS API (local/s3a/gs) — the producer/consumer threads + 100 MB
  * buffer + depth-1 channel of the reference ARE Spark's executor
  * parallelism here, and "one in-flight chunk per writer" becomes one
  * open stream per task. Sizes come back via `collect` of per-part
  * *metadata* (a few longs per part — never data).
  */
class Datastore(rootUri: String, spark: SparkSession) {

  private val catalog = new Catalog(rootUri, spark.sparkContext.hadoopConfiguration)

  /** Write a statement dump; returns the registered catalog entry. */
  def write(
      dumpName: String,
      statements: Dataset[String],
      compressed: Boolean = true,
      encryptionKey: Option[String] = None,
      chunkBytes: Int = 100 * 1024 * 1024): DumpMeta = {
    import spark.implicits._
    val confSer = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val root = rootUri
    val partsMeta: Seq[(String, Long, Long)] = statements
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fs = new Path(root).getFileSystem(confSer.value)
        val written = Seq.newBuilder[(String, Long, Long)]
        var chunkIdx = 0
        val buf = new ByteArrayOutputStream(64 * 1024)
        def flush(): Unit = if (buf.size() > 0) {
          val raw = buf.toByteArray
          val encoded = Codecs.encode(raw, compressed, encryptionKey)
          val partName = f"$pid%05d-$chunkIdx%03d.dump"
          val p = new Path(new Path(root, dumpName), partName)
          val out = fs.create(p, true)
          try out.write(encoded) finally out.close()
          written += ((partName, encoded.length.toLong, Crc64.of(raw)))
          chunkIdx += 1
          buf.reset()
        }
        it.foreach { stmt =>
          val bytes = (stmt + "\n").getBytes("UTF-8")
          if (buf.size() > 0 && buf.size() + bytes.length > chunkBytes) flush()
          buf.write(bytes)
        }
        flush()
        written.result().iterator
      }
      .collect().toSeq // part names + sizes + checksums only
    val meta = DumpMeta(
      directoryName = dumpName,
      size = partsMeta.map(_._2).sum,
      createdAt = System.currentTimeMillis(),
      compressed = compressed,
      encrypted = encryptionKey.isDefined)
    catalog.register(meta)
    meta
  }

  /** Read a dump back as statements, parts in name order (matching the
    * reference's part-enumeration order, `local_disk.rs:183-207`).
    */
  def read(
      dumpName: String,
      encryptionKey: Option[String] = None): Dataset[String] = {
    import spark.implicits._
    val meta = catalog.byName(dumpName)
      .getOrElse(throw new IllegalArgumentException(s"dump not found in catalog: $dumpName"))
    val compressed = meta.compressed
    spark.read.format("binaryFile")
      .load(s"$rootUri/$dumpName/*.dump")
      .select("path", "content")
      // binaryFile sorts its splits by SIZE (bin-packing), not name —
      // the range sort restores part order so downstream consumers that
      // derive statement positions from partition order (DumpReader
      // .statementsFromStrings) see chunks in dump order
      .orderBy("path")
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val raw = Codecs.decode(bytes, compressed, encryptionKey)
        // statement-aware split (a statement may contain newlines);
        // chunk boundaries always fall between statements on write
        graft.ingest.StatementSplitter.split(new String(raw, "UTF-8")).iterator.map(_.text)
      }
  }

  def catalogOps: Catalog = catalog
}
