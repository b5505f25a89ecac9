package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.ingest.Bson._
import graft.store.Crc64

/** mongodump `--archive` container codec + Spark bridge — the S3/N3/D3
  * analogs of SURVEY §2.1 "Archive" / §2.7 N3 / §2.8 D3.
  *
  * Wire layout (public mongo-tools archive format; reference layout doc
  * `dump-parser/src/mongodb/mod.rs:53-91`, parse loop `:100-164`,
  * re-serialization with CRC fix-up `:173-248`):
  *
  *   magic (4 bytes, LE 0x8199e26d) ·
  *   header BSON {concurrent_collections, version, server_version,
  *   tool_version} ·
  *   one metadata BSON per collection {db, collection, metadata, size,
  *   type} · separator (0xFFFFFFFF) ·
  *   per collection: namespace BSON {db, collection, EOF:false, CRC:0} ·
  *   body documents · separator · and a closing namespace BSON
  *   {db, collection, EOF:true, CRC: crc64-ecma of the body bytes} ·
  *   separator.
  *
  * Scale posture: the archive is by definition ONE sequential
  * bytestream (the reference also holds it fully in memory,
  * `dump-parser/src/mongodb/mod.rs:92-98`), but only the FRAMING is
  * inherently sequential — the per-document work is not. Both
  * directions put it on the executors: `writeTables` encodes rows
  * executor-side and the driver streams pre-encoded chunks (r15);
  * `readDistributed` has the driver length-skip the container once to
  * index doc-aligned byte slices, and executors decode + CRC them
  * (r16). The in-memory `read`/`restore` pair remains for byte-array /
  * pipe inputs (mongodump over stdout is driver-attached by nature).
  * Big data belongs in parquet datastores (D6/D7); this codec exists
  * for interchange with mongodump/mongorestore tooling.
  */
object MongoArchive {

  private val Magic = Array[Byte](0x6d.toByte, 0xe2.toByte, 0x99.toByte, 0x81.toByte)
  private val Separator = 0xFFFFFFFF

  final case class Header(
      concurrentCollections: Int,
      version: String,
      serverVersion: String,
      toolVersion: String)

  final case class CollectionMeta(
      db: String,
      collection: String,
      metadata: String,
      size: Int,
      collectionType: String) {
    def prefix: String = s"$db.$collection"
  }

  /** Parsed archive: header + per-collection metadata + documents (in
    * block order) + the CRC64 read from each EOF namespace.
    */
  final case class Archive(
      header: Header,
      metas: Seq[CollectionMeta],
      collections: Map[String, Vector[BDoc]],
      crcs: Map[String, Long])

  // ---- read ----

  /** Parse and CRC-verify an archive bytestream. */
  def read(bytes: Array[Byte]): Archive = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); buf.get(magic)
    require(magic.sameElements(Magic), "not a mongodump archive (bad magic)")

    val headerDoc = Bson.decode(buf)
    val header = Header(
      headerDoc.getInt("concurrent_collections").getOrElse(1),
      headerDoc.getStr("version").getOrElse(""),
      headerDoc.getStr("server_version").getOrElse(""),
      headerDoc.getStr("tool_version").getOrElse(""))

    // metadata docs until the first separator
    val metas = Seq.newBuilder[CollectionMeta]
    while (peekInt(buf) != Separator) {
      val d = Bson.decode(buf)
      metas += CollectionMeta(
        d.getStr("db").getOrElse(""),
        d.getStr("collection").getOrElse(""),
        d.getStr("metadata").getOrElse(""),
        d.getInt("size").getOrElse(0),
        d.getStr("type").getOrElse("collection"))
    }
    buf.getInt // consume separator

    val collections = scala.collection.mutable.LinkedHashMap[String, Vector[BDoc]]()
    val crcs = scala.collection.mutable.Map[String, Long]()
    val metaList = metas.result()
    var eofSeen = 0
    while (eofSeen < metaList.size && buf.hasRemaining) {
      val ns = Bson.decode(buf)
      val prefix = s"${ns.getStr("db").getOrElse("")}.${ns.getStr("collection").getOrElse("")}"
      val isEof = ns.getBool("EOF").getOrElse(false)
      val docs = Vector.newBuilder[BDoc]
      while (peekInt(buf) != Separator) docs += Bson.decode(buf)
      buf.getInt // consume separator
      if (isEof) {
        eofSeen += 1
        crcs(prefix) = ns.getLong("CRC").getOrElse(0L)
      } else {
        // append: mongodump with concurrent_collections > 1 interleaves
        // multiple data blocks per namespace (the reference's HashMap
        // insert silently keeps only the last block — a data-loss bug
        // not worth reproducing)
        collections(prefix) = collections.getOrElse(prefix, Vector.empty) ++ docs.result()
      }
    }

    require(eofSeen == metaList.size,
      s"truncated archive: ${metaList.size} collections declared, only $eofSeen EOF blocks found")
    val archive = Archive(header, metaList, collections.toMap, crcs.toMap)
    for ((prefix, docs) <- archive.collections; expected <- archive.crcs.get(prefix)) {
      val actual = bodyCrc(docs)
      require(actual == expected,
        f"CRC mismatch for $prefix: archive declares 0x$expected%016x, body is 0x$actual%016x")
    }
    archive
  }

  private def peekInt(buf: ByteBuffer): Int =
    if (buf.remaining() < 4) Separator else buf.getInt(buf.position())

  private def bodyCrc(docs: Seq[BDoc]): Long = {
    val out = new ByteArrayOutputStream()
    docs.foreach(d => out.write(Bson.encode(d)))
    Crc64.of(out.toByteArray)
  }

  // ---- distributed read ----

  /** One doc-aligned byte range of a collection's body. `seq` orders a
    * collection's slices across (and within) its data blocks so the
    * per-slice CRCs fold back to the declared body CRC.
    */
  final case class Slice(prefix: String, seq: Int, offset: Long, length: Long)

  /** Archive structure without the documents: what the driver keeps in
    * the distributed read — header, metadata, doc-aligned slice ranges,
    * declared CRCs. O(#slices) memory, never O(bytes).
    */
  final case class ArchiveIndex(
      header: Header,
      metas: Seq[CollectionMeta],
      slices: Seq[Slice],
      crcs: Map[String, Long])

  /** Default slice target: big enough that slice count stays tiny,
    * small enough that one decode task never holds a collection.
    */
  val DefaultSliceBytes: Int = 32 << 20

  /** Structural scan of an archive stream: walks the container framing
    * with per-document LENGTH SKIPS (every BSON doc and every archive
    * item is int32-length-prefixed), decoding only the handful of
    * header/metadata/namespace documents — O(one document) memory, no
    * body decode. Body bytes are cut into doc-aligned [[Slice]]s of
    * ~`maxSliceBytes` for the executors. This is the driver's entire
    * share of [[readDistributed]], mirroring the r15 distributed writer
    * (`writeTables`) where the driver does framing only.
    */
  def scan(in: java.io.InputStream, maxSliceBytes: Int = DefaultSliceBytes): ArchiveIndex = {
    val din = new java.io.DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    var pos = 0L
    def readLE4(): Int = {
      val a = din.read(); val b = din.read(); val c = din.read(); val d = din.read()
      require(d >= 0, "truncated archive: unexpected end of stream")
      pos += 4
      (a & 0xFF) | ((b & 0xFF) << 8) | ((c & 0xFF) << 16) | ((d & 0xFF) << 24)
    }
    // re-stitch the 4 length bytes so Bson.decode sees a whole document
    def readDoc(len: Int): BDoc = {
      require(len >= 5, s"invalid BSON length $len")
      val buf = new Array[Byte](len)
      buf(0) = (len & 0xFF).toByte; buf(1) = ((len >> 8) & 0xFF).toByte
      buf(2) = ((len >> 16) & 0xFF).toByte; buf(3) = ((len >> 24) & 0xFF).toByte
      din.readFully(buf, 4, len - 4); pos += len - 4
      Bson.decode(buf)
    }
    def skipDoc(len: Int): Unit = {
      var left = (len - 4).toLong
      while (left > 0) {
        val s = din.skip(left)
        if (s <= 0) { require(din.read() >= 0, "truncated archive body"); left -= 1; pos += 1 }
        else { left -= s; pos += s }
      }
    }

    val magic = new Array[Byte](4); din.readFully(magic); pos += 4
    require(magic.sameElements(Magic), "not a mongodump archive (bad magic)")
    val headerDoc = readDoc(readLE4())
    val header = Header(
      headerDoc.getInt("concurrent_collections").getOrElse(1),
      headerDoc.getStr("version").getOrElse(""),
      headerDoc.getStr("server_version").getOrElse(""),
      headerDoc.getStr("tool_version").getOrElse(""))

    val metas = Seq.newBuilder[CollectionMeta]
    var next = readLE4()
    while (next != Separator) {
      val d = readDoc(next)
      metas += CollectionMeta(
        d.getStr("db").getOrElse(""),
        d.getStr("collection").getOrElse(""),
        d.getStr("metadata").getOrElse(""),
        d.getInt("size").getOrElse(0),
        d.getStr("type").getOrElse("collection"))
      next = readLE4()
    }
    val metaList = metas.result()

    val slices = Seq.newBuilder[Slice]
    val crcs = scala.collection.mutable.Map[String, Long]()
    val seqOf = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    var eofSeen = 0
    while (eofSeen < metaList.size) {
      val ns = readDoc(readLE4())
      val prefix = s"${ns.getStr("db").getOrElse("")}.${ns.getStr("collection").getOrElse("")}"
      val isEof = ns.getBool("EOF").getOrElse(false)
      var sliceStart = pos
      var sliceLen = 0L
      def emit(): Unit = if (sliceLen > 0) {
        slices += Slice(prefix, seqOf(prefix), sliceStart, sliceLen)
        seqOf(prefix) += 1
        sliceLen = 0L
      }
      var len = readLE4()
      while (len != Separator) {
        if (sliceLen == 0L) sliceStart = pos - 4 // the doc began at its length prefix
        skipDoc(len)
        sliceLen += len
        if (sliceLen >= maxSliceBytes) emit()
        len = readLE4()
      }
      emit()
      if (isEof) {
        eofSeen += 1
        crcs(prefix) = ns.getLong("CRC").getOrElse(0L)
      }
    }
    require(eofSeen == metaList.size,
      s"truncated archive: ${metaList.size} collections declared, only $eofSeen EOF blocks found")
    ArchiveIndex(header, metaList, slices.result(), crcs.toMap)
  }

  /** [[scan]] of an archive file via the Hadoop FileSystem API — local
    * paths in this sandbox; the same call shape reaches hdfs/s3a/gs
    * when connector jars are on the classpath (docs/ARTIFACTS.md).
    */
  def scanFile(path: String, maxSliceBytes: Int = DefaultSliceBytes): ArchiveIndex = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(fsConf).open(p)
    try scan(in, maxSliceBytes) finally in.close()
  }

  /** One Hadoop Configuration per JVM: constructing one parses the
    * default XML resources, which is measurable when every slice task
    * on an executor would otherwise pay it (FileSystem instances are
    * already cached by Hadoop itself, keyed on scheme+authority).
    */
  @transient private lazy val fsConf = new org.apache.hadoop.conf.Configuration()

  /** Executor-side range read — every executor must reach `path`
    * (shared FS / object store; trivially true on local[n]).
    */
  private def readRange(path: String, offset: Long, length: Long): Array[Byte] = {
    require(length <= Int.MaxValue, s"slice of $length bytes exceeds the JVM array limit")
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(fsConf).open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](length.toInt)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  private[graft] def decodeDocs(bytes: Array[Byte]): Vector[BDoc] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Vector.newBuilder[BDoc]
    while (buf.hasRemaining) out += Bson.decode(buf)
    out.result()
  }

  /** S3/D3 at scale: archive file → per-collection DataFrames with the
    * per-document work on the EXECUTORS. The driver runs [[scan]]
    * (framing + slice ranges only), then
    *   1. verifies each collection's CRC64 distributedly — executors
    *      CRC their slices, the driver folds the per-slice values in
    *      slice order with the GF(2) `Crc64.combine` (one (prefix, seq,
    *      crc, len) tuple per slice comes back, never document bytes);
    *   2. builds each collection's frame from its slices — one decode
    *      task per slice, `docToRow` under the caller's schema (or a
    *      schema inferred the same way: per-slice raw inference merged
    *      through [[mergeType]] in slice order, matching the
    *      single-pass [[inferSchema]] result).
    * The in-memory [[read]]/[[restore]] pair stays for byte-array /
    * pipe inputs (the reference's whole-archive-in-memory semantics,
    * `dump-parser/src/mongodb/mod.rs:92-98`); this is the path for
    * archives that live on storage executors can reach.
    */
  def readDistributed(spark: SparkSession, path: String,
                      schemas: Map[String, StructType] = Map.empty,
                      maxSliceBytes: Int = DefaultSliceBytes): Map[String, DataFrame] = {
    val idx = scanFile(path, maxSliceBytes)
    val all = idx.slices
    val actual: Map[String, Long] =
      if (all.isEmpty) Map.empty
      else spark.sparkContext.parallelize(all, math.min(all.size, 64))
        .map(s => (s.prefix, s.seq, Crc64.of(readRange(path, s.offset, s.length)), s.length))
        .collect()
        .groupBy(_._1)
        .map { case (p, parts) =>
          p -> parts.sortBy(_._2).foldLeft(0L) {
            case (acc, (_, _, crc, len)) => Crc64.combine(acc, crc, len)
          }
        }
    for ((prefix, expected) <- idx.crcs) {
      val a = actual.getOrElse(prefix, 0L)
      require(a == expected,
        f"CRC mismatch for $prefix: archive declares 0x$expected%016x, body is 0x$a%016x")
    }
    idx.metas.map { m =>
      val prefix = m.prefix
      val mine = all.filter(_.prefix == prefix).sortBy(_.seq)
      val schema = schemas.getOrElse(prefix, {
        if (mine.isEmpty) StructType(Nil)
        else finalizeNullFields(
          spark.sparkContext.parallelize(mine, mine.size)
            .map(s => (s.seq, inferSchemaRaw(decodeDocs(readRange(path, s.offset, s.length)))))
            .collect().sortBy(_._1).map(_._2)
            .reduce((a, b) => mergeType(a, b).asInstanceOf[StructType]))
      })
      val rows =
        if (mine.isEmpty) spark.sparkContext.emptyRDD[Row]
        else spark.sparkContext.parallelize(mine, mine.size)
          .flatMap(s => decodeDocs(readRange(path, s.offset, s.length)).map(docToRow(_, schema)))
      prefix -> spark.createDataFrame(rows, schema)
    }.toMap
  }

  // ---- write ----

  /** Serialize an archive, recomputing every collection's CRC64 from
    * its (possibly transformed) documents — the N3 fix-up the reference
    * performs in `Archive::into_bytes`.
    */
  def write(archive: Archive): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeProlog(out, archive.header, archive.metas)
    for (m <- archive.metas) {
      val docs = archive.collections.getOrElse(m.prefix, Vector.empty)
      writeCollection(out, m.db, m.collection, docs.iterator.map(Bson.encode))
    }
    out.toByteArray
  }

  /** Magic + header BSON + one metadata BSON per collection + separator
    * — the single framing implementation `write` and `writeTables`
    * share (the byte-identity `MongoArchiveSpec` enforces would
    * otherwise depend on two copies staying in sync by hand).
    */
  private def writeProlog(out: java.io.OutputStream, header: Header,
                          metas: Seq[CollectionMeta]): Unit = {
    out.write(Magic)
    out.write(Bson.encode(BDoc(
      "concurrent_collections" -> BInt32(header.concurrentCollections),
      "version" -> BStr(header.version),
      "server_version" -> BStr(header.serverVersion),
      "tool_version" -> BStr(header.toolVersion))))
    for (m <- metas) {
      out.write(Bson.encode(BDoc(
        "db" -> BStr(m.db),
        "collection" -> BStr(m.collection),
        "metadata" -> BStr(m.metadata),
        "size" -> BInt32(m.size),
        "type" -> BStr(m.collectionType))))
    }
    writeSeparator(out)
  }

  /** One collection's framing — open namespace, body written by
    * `body` (which returns the body CRC64), separator, closing EOF
    * namespace carrying the CRC, separator. The single framing
    * implementation the in-memory Archive path and the distributed
    * DataFrame path share, so both produce byte-identical envelopes by
    * construction. Returns the body CRC.
    */
  private def framedCollection(out: java.io.OutputStream, db: String, coll: String)
                              (body: => Long): Long = {
    out.write(nsDoc(db, coll, eof = false, crc = 0L))
    val crc = body
    writeSeparator(out)
    out.write(nsDoc(db, coll, eof = true, crc = crc))
    writeSeparator(out)
    crc
  }

  /** Streamed per-document body: running CRC64 fold, O(one document)
    * of state (the in-memory Archive serialization path).
    */
  private def writeCollection(out: java.io.OutputStream, db: String, coll: String,
                              docBytes: Iterator[Array[Byte]]): Long =
    framedCollection(out, db, coll) {
      var crc = 0L
      for (bytes <- docBytes) {
        crc = Crc64.update(crc, bytes)
        out.write(bytes)
      }
      crc
    }

  /** Stream DataFrames straight into archive bytes on `out` without
    * materializing any collection — and without doing the per-document
    * work on the driver. Each partition is BSON-ENCODED ON ITS
    * EXECUTOR (`mapPartitions`: Row → BSON bytes + that chunk's CRC64
    * + length); the driver pulls one pre-encoded chunk at a time in
    * partition order (`toLocalIterator`), writes it through, and folds
    * the collection CRC with `Crc64.combine` — so the driver's work is
    * framing (namespaces, separators, the closing EOF+CRC doc) plus a
    * memcpy per chunk, O(one partition's bytes) of memory, zero
    * per-document CPU. The wire format permits the single pass because
    * the CRC lives in the *closing* EOF namespace, after the body; the
    * bytestream itself is inherently sequential (it's one archive), so
    * the driver remains the writer — but encode, the actual per-row
    * cost, now scales with the cluster. Output is byte-identical to
    * the previous driver-encoded form (MongoArchiveSpec pins this on a
    * multi-partition collection). Returns the per-collection CRC64s.
    */
  def writeTables(out: java.io.OutputStream, db: String,
                  tables: Seq[(String, DataFrame)],
                  toolVersion: String = "graft"): Map[String, Long] = {
    writeProlog(out, Header(1, "0.1", "n/a", toolVersion),
      tables.map { case (name, _) => defaultMeta(db, name) })
    val crcs = Map.newBuilder[String, Long]
    for ((name, df) <- tables) {
      val schema = df.schema
      // Doc-aligned chunks of ~WriterChunkBytes per element, not one
      // chunk per partition: a partition whose encoding neared 2 GB
      // would hit the JVM single-array limit on the executor (and force
      // the driver to hold it whole). Crc64.combine folds arbitrary
      // chunkings, and concatenation is unchanged, so the output stays
      // byte-identical (MongoArchiveSpec pins it). toLocalIterator
      // still materializes one PARTITION's chunks driver-side at a
      // time, so driver memory is O(one partition's bytes) — bound the
      // input's partition sizes, not this writer, if that ever binds.
      val chunks = df.rdd.mapPartitions { rows =>
        new Iterator[(Array[Byte], Long)] {
          private var pending: Array[Byte] = null
          private def fill(): Unit = {
            if (pending == null && rows.hasNext) {
              val buf = new java.io.ByteArrayOutputStream()
              while (rows.hasNext && buf.size < WriterChunkBytes)
                buf.write(Bson.encode(rowToDoc(rows.next(), schema)))
              if (buf.size > 0) pending = buf.toByteArray
            }
          }
          def hasNext: Boolean = { fill(); pending != null }
          def next(): (Array[Byte], Long) = {
            fill()
            val c = pending; pending = null
            (c, Crc64.of(c))
          }
        }
      }
      val crc = framedCollection(out, db, name) {
        var c = 0L
        val it = chunks.toLocalIterator
        while (it.hasNext) {
          val (bytes, chunkCrc) = it.next()
          out.write(bytes)
          c = Crc64.combine(c, chunkCrc, bytes.length.toLong)
        }
        c
      }
      crcs += (s"$db.$name" -> crc)
    }
    crcs.result()
  }

  /** Target encoded-chunk size for [[writeTables]]'s executor-side
    * encode — well under the 2 GB JVM array limit with headroom for one
    * oversized trailing document.
    */
  private[graft] val WriterChunkBytes: Int = 64 << 20

  private def defaultMeta(db: String, name: String): CollectionMeta =
    CollectionMeta(db, name, s"""{"collectionName":"$name"}""", 0, "collection")

  private def nsDoc(db: String, coll: String, eof: Boolean, crc: Long): Array[Byte] =
    Bson.encode(BDoc(
      "db" -> BStr(db), "collection" -> BStr(coll),
      "EOF" -> BBool(eof), "CRC" -> BInt64(crc)))

  private def writeSeparator(out: java.io.OutputStream): Unit = {
    out.write(0xFF); out.write(0xFF); out.write(0xFF); out.write(0xFF)
  }

  // ---- Spark bridge ----

  /** BDoc documents → DataFrame under an explicit schema (S3: archive →
    * per-collection frames). Fields absent from a document become null.
    */
  def toDataFrame(spark: SparkSession, docs: Seq[BDoc], schema: StructType): DataFrame = {
    val rows = docs.map(d => docToRow(d, schema))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 10000 + 1)), schema)
  }

  private def docToRow(doc: BDoc, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map(f => fromBson(doc.get(f.name).getOrElse(BNull), f.dataType)))

  private def fromBson(v: BVal, dt: DataType): Any = (v, dt) match {
    case (BNull, _)                       => null
    case (BInt64(l), LongType)            => l
    case (BInt32(i), IntegerType)         => i
    case (BInt32(i), LongType)            => i.toLong
    case (BInt64(l), DoubleType)          => l.toDouble
    case (BInt32(i), DoubleType)          => i.toDouble
    case (BTimestamp(t), LongType)        => t
    case (BDouble(d), DoubleType)         => d
    case (BStr(s), StringType)            => s
    case (BBool(b), BooleanType)          => b
    case (BBin(_, b), BinaryType)         => b
    case (BObjectId(b), StringType)       => b.map("%02x".format(_)).mkString
    case (BDateTime(ms), TimestampType)   => new java.sql.Timestamp(ms)
    case (BDateTime(ms), DateType)        => new java.sql.Date(ms)
    case (BArr(items), ArrayType(et, _))  => items.map(fromBson(_, et))
    case (d: BDoc, st: StructType)        => docToRow(d, st)
    case (BTimestamp(t), DoubleType)      => t.toDouble
    case (d: BDecimal128, dt: DecimalType) =>
      // setScale with no rounding mode is the loud path: a value that
      // doesn't fit an EXPLICIT schema's scale throws instead of
      // rounding (inferred schemas always fit — inference derives
      // (p, s) from the values)
      d.toBigDecimal.map(_.setScale(dt.scale)).getOrElse(
        throw new IllegalArgumentException(
          s"Decimal128 ${d.render} cannot map to $dt (NaN/Infinity have no decimal value)"))
    // integer-typed values under a decimal field (mixed-type merge —
    // BTimestamp also infers LongType, so it must map too or a field
    // mixing timestamps with decimals throws mid-restore): widening the
    // scale never loses information
    case (BInt64(l), dt: DecimalType) => new java.math.BigDecimal(l).setScale(dt.scale)
    case (BInt32(i), dt: DecimalType) => new java.math.BigDecimal(i).setScale(dt.scale)
    case (BTimestamp(t), dt: DecimalType) => new java.math.BigDecimal(t).setScale(dt.scale)
    // widened-to-string fallback (mixed-type fields under inference):
    // EVERY value type must render, or schema-free restore of a
    // heterogeneous field throws mid-collection
    case (other, StringType)              => renderCompact(other)
    case (other, t) => throw new IllegalArgumentException(s"cannot map BSON $other to Spark $t")
  }

  /** Deterministic compact rendering for values widened to STRING. */
  private def renderCompact(v: BVal): String = v match {
    case BStr(s) => s
    case BInt64(l) => l.toString
    case BInt32(i) => i.toString
    case BDouble(d) => d.toString
    case BBool(b) => b.toString
    case BDateTime(ms) => new java.sql.Timestamp(ms).toString
    case BTimestamp(t) => t.toString
    case BObjectId(b) => b.map("%02x".format(_)).mkString
    case BBin(_, b) => java.util.Base64.getEncoder.encodeToString(b)
    case d: BDecimal128 => d.render
    case BNull => null
    case BArr(items) => items.map(renderCompact).mkString("[", ",", "]")
    case d: BDoc =>
      d.fields.map { case (n, x) => s"$n:${renderCompact(x)}" }.mkString("{", ",", "}")
  }

  /** One Row → one BSON document under the frame's schema. */
  def rowToDoc(row: Row, schema: StructType): BDoc =
    BDoc(schema.fields.toVector.map(f => f.name -> toBson(row.get(schema.fieldIndex(f.name)), f.dataType)))

  private def toBson(v: Any, dt: DataType): BVal = (v, dt) match {
    case (null, _)                        => BNull
    case (l: Long, LongType)              => BInt64(l)
    case (i: Integer, IntegerType)        => BInt32(i)
    case (s: java.lang.Short, ShortType)  => BInt32(s.toInt)
    case (b: java.lang.Byte, ByteType)    => BInt32(b.toInt)
    case (d: java.lang.Double, DoubleType) => BDouble(d)
    case (f: java.lang.Float, FloatType)  => BDouble(f.toDouble)
    // decimals travel as native BSON Decimal128 (type 0x13) — lossless
    // up to decimal128's 34 significant digits, loud beyond
    case (d: java.math.BigDecimal, _: DecimalType) => BDecimal128.fromBigDecimal(d)
    case (d: Decimal, _: DecimalType)     => BDecimal128.fromBigDecimal(d.toJavaBigDecimal)
    case (s: String, StringType)          => BStr(s)
    case (b: java.lang.Boolean, BooleanType) => BBool(b)
    case (b: Array[Byte], BinaryType)     => BBin(0x00, b)
    case (t: java.sql.Timestamp, TimestampType) => BDateTime(t.getTime)
    case (d: java.sql.Date, DateType)     => BDateTime(d.getTime)
    // collection.Seq, NOT the default (immutable.Seq) alias: catalyst
    // hands array values back as mutable.ArraySeq, which the immutable
    // pattern silently misses — arrays in frames built from BSON
    // restore (immutable Vectors) matched, arrays in frames that went
    // through Spark row conversion did not
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      BArr(s.toVector.map(toBson(_, et)))
    case (r: Row, st: StructType)         => rowToDoc(r, st)
    case (other, t) => throw new IllegalArgumentException(s"cannot map Spark $other: $t to BSON")
  }

  /** Build an archive from DataFrames (D6-style dump of tables into the
    * mongorestore-compatible container). Collection order follows the
    * input sequence; document order is the frames' current ordering, so
    * callers wanting determinism should `orderBy` first. Rows stream in
    * through `toLocalIterator` (one partition buffered at a time, never
    * the Row array + doc vector double-materialized); the resulting
    * in-memory `Archive` is for bounded manipulation — unbounded writes
    * should go straight to bytes via [[writeTables]].
    */
  def fromTables(db: String, tables: Seq[(String, DataFrame)], toolVersion: String = "graft"): Archive = {
    import scala.jdk.CollectionConverters._
    val colls = tables.map { case (name, df) =>
      val schema = df.schema
      s"$db.$name" -> df.toLocalIterator().asScala.map(rowToDoc(_, schema)).toVector
    }.toMap
    val metas = tables.map { case (name, _) => defaultMeta(db, name) }
    Archive(Header(1, "0.1", "n/a", toolVersion), metas, colls,
      colls.map { case (p, docs) => p -> bodyCrc(docs) })
  }

  /** D3 analog (`mongorestore --archive`): explode an archive into
    * per-collection DataFrames, ready for any engine sink (JDBC D1/D2,
    * parquet datastore D6).
    */
  def restore(spark: SparkSession, archive: Archive, schemas: Map[String, StructType]): Map[String, DataFrame] =
    archive.collections.map { case (prefix, docs) =>
      prefix -> toDataFrame(spark, docs, schemas(prefix))
    }

  /** Restore with schemas inferred from the documents themselves. */
  def restore(spark: SparkSession, archive: Archive): Map[String, DataFrame] =
    archive.collections.map { case (prefix, docs) =>
      prefix -> toDataFrame(spark, docs, inferSchema(docs))
    }

  /** S11 (Mongo leg): schema inference over BSON documents — the
    * reference samples documents through a probabilistic schema parser
    * (`source/mongodb.rs:302-329`); here every document contributes
    * (archives are bounded, see the scale note above). Field order
    * follows first appearance; conflicting types widen (long+double →
    * double, anything else → string); nested documents and arrays
    * recurse. All fields are nullable (absence = null).
    */
  def inferSchema(docs: Seq[BDoc]): StructType = finalizeNullFields(inferSchemaRaw(docs))

  /** Top-level fields that never held a non-null value land as
    * StringType (a NullType column is unwritable); split out of
    * [[inferSchema]] so the distributed path can merge per-slice RAW
    * schemas first — finalizing per slice would widen a field that is
    * all-null in one slice but typed in another to string, diverging
    * from the single-pass result.
    */
  private[graft] def finalizeNullFields(st: StructType): StructType =
    StructType(st.fields.map(f =>
      StructField(f.name, if (f.dataType == NullType) StringType else f.dataType)))

  /** The widening lattice [[inferSchema]] folds documents through —
    * object-level (and associative in practice) so the distributed read
    * can fold per-slice schemas on the driver in slice order.
    */
  private[graft] def mergeType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (x: DecimalType, y: DecimalType) => mergeDecimal(x, y)
    case (x: DecimalType, LongType) => mergeDecimal(x, DecimalType(20, 0))
    case (LongType, y: DecimalType) => mergeDecimal(y, DecimalType(20, 0))
    case (x: StructType, y: StructType) =>
      val names = (x.fieldNames ++ y.fieldNames).distinct
      StructType(names.map { n =>
        val xt = x.fields.find(_.name == n).map(_.dataType).getOrElse(NullType)
        val yt = y.fields.find(_.name == n).map(_.dataType).getOrElse(NullType)
        StructField(n, mergeType(xt, yt))
      })
    case (ArrayType(x, _), ArrayType(y, _)) => ArrayType(mergeType(x, y))
    case _ => StringType
  }

  private[graft] def inferSchemaRaw(docs: Seq[BDoc]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[String, DataType]()
    def merge(a: DataType, b: DataType): DataType = mergeType(a, b)
    def typeOf(v: BVal): DataType = v match {
      case _: BInt64 | _: BInt32 => LongType
      case _: BDouble => DoubleType
      case _: BStr => StringType
      case _: BBool => BooleanType
      case _: BBin => BinaryType
      case _: BObjectId => StringType
      case _: BDateTime => TimestampType
      case _: BTimestamp => LongType
      // decimal128: infer the tight (precision, scale) from the VALUE —
      // a fixed (38, 18) guess throws on scale > 18 or > 20 integer
      // digits, both of which decimal128 (and the engine's own sinks)
      // legitimately produce. NaN/±Infinity have no decimal value and
      // widen to string; merge() unions (p, s) across documents.
      case d: BDecimal128 => d.toBigDecimal match {
        case Some(bd) =>
          val scale = math.max(0, bd.scale)
          val intDigits = math.max(1, bd.precision - bd.scale)
          if (intDigits + scale > DecimalType.MAX_PRECISION) StringType
          else DecimalType(intDigits + scale, scale)
        case None => StringType
      }
      case BNull => NullType
      case d: BDoc => StructType(d.fields.map { case (n, x) => StructField(n, typeOf(x)) })
      case BArr(items) =>
        ArrayType(items.map(typeOf).foldLeft(NullType: DataType)(merge))
    }
    for (d <- docs; (name, v) <- d.fields) {
      order(name) = order.get(name).map(merge(_, typeOf(v))).getOrElse(typeOf(v))
    }
    StructType(order.toSeq.map { case (n, dt) => StructField(n, dt) })
  }

  /** Union of two decimal shapes: enough integer digits and scale for
    * both; wider than decimal can hold → string (restore keeps working
    * via the widened-to-string rendering instead of overflowing).
    */
  private def mergeDecimal(a: DecimalType, b: DecimalType): DataType = {
    val scale = math.max(a.scale, b.scale)
    val intDigits = math.max(a.precision - a.scale, b.precision - b.scale)
    if (intDigits + scale > DecimalType.MAX_PRECISION) StringType
    else DecimalType(intDigits + scale, scale)
  }
}
