package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` cells with
  * typed metadata, processed in executor-side batches.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `fakeDecode` derives deterministic pseudo-features from the bytes'
  * md5. Everything around it is the real production shape — binary
  * schema, batch iteration (the JVM analog of a Pandas-UDF batch),
  * per-partition amortized "codec" setup, and a typed feature schema —
  * so swapping in a real codec touches exactly one function.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Test harness: synthesize a binary media column from text (utf-8
    * bytes) with a media_type tag. At production scale this column comes
    * from parquet binary columns written by the collection pipeline.
    */
  def packText(df: DataFrame, id: Column, text: Column, mediaType: String): DataFrame =
    df.select(
      id.cast("long").as("media_id"),
      encode(text, "UTF-8").as("media"),
      lit(mediaType).as("media_type"))

  /** Plumbing-level metadata as pure expressions (SQL-mirrorable):
    * byte size + checksum — what a manifest/catalog stage computes
    * without decoding.
    */
  def metadata(media: Column): Seq[Column] = Seq(
    octet_length(media).as("n_bytes"),
    md5(media).as("checksum"))

  /** STUB decode — deterministic fake features from the md5 of the
    * bytes. Replace the body with a real codec (javax.imageio, ffmpeg
    * bindings, …) to productionize; signature and batch shape stay.
    */
  private[ops] def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val width = ((d(0) & 0xff) % 64) + 1
    val height = ((d(1) & 0xff) % 64) + 1
    val feature = d.take(8).map(b => (b & 0xff) / 255.0)
    (width, height, feature)
  }

  /** Batched feature extraction over (media_id, media, media_type) rows.
    * `batchSize` mirrors a Pandas-UDF's arrow batch: the stub codec is
    * "initialized" once per partition and fed fixed-size groups — the
    * shape a real vectorized decoder needs.
    */
  def decodeFeatures(df: DataFrame, batchSize: Int = 128): DataFrame = {
    val enc = Encoders.row(featureSchema)
    df.select(col("media_id"), col("media"), col("media_type"))
      .mapPartitions { rows =>
        // per-partition codec setup would happen here (once, not per row)
        val digestWarm = MessageDigest.getInstance("MD5")
        digestWarm.reset()
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val mtype = if (r.isNullAt(2)) null else r.getString(2)
            val checksum = md5Hex(bytes)
            val (w, h, feat) = fakeDecode(bytes)
            Row(id, mtype, bytes.length.toLong, checksum, w, h, feat.toSeq)
          }
        }
      }(enc)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Batched resize — binary→binary map, the second canonical media
    * op shape (same row count, transformed payload). STUB codec: the
    * "resized" payload is the original bytes truncated/cycled to
    * w·h/64 length, deterministic; a real implementation swaps in an
    * image library per partition.
    */
  def resize(df: DataFrame, width: Int, height: Int, batchSize: Int = 128): DataFrame = {
    val enc = Encoders.row(resizedSchema)
    df.select(col("media_id"), col("media"), col("media_type"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val n = math.max(1, width * height / 64)
            val out = Array.tabulate(n)(i => if (bytes.isEmpty) 0.toByte else bytes(i % bytes.length))
            Row(r.getLong(0), out, if (r.isNullAt(2)) null else r.getString(2), width, height)
          }
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling — the one-to-many media shape (video → every
    * `everyNth` frame as its own row), an executor-side generator like
    * a Pandas-UDF returning more rows than it got. STUB codec: frames
    * are fixed-width byte windows (`frameBytes`), frame count derives
    * from payload length; a real demuxer replaces the body only.
    */
  def frameSample(df: DataFrame, everyNth: Int, frameBytes: Int = 256, batchSize: Int = 128): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    val enc = Encoders.row(frameSchema)
    df.select(col("media_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val nFrames = math.max(1, bytes.length / frameBytes)
            (0 until nFrames by everyNth).iterator.map { f =>
              val from = f * frameBytes
              Row(id, f, java.util.Arrays.copyOfRange(bytes, from, math.min(bytes.length, from + frameBytes)))
            }
          }
        }
      }(enc)
  }
}
