package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal BSON value model + codec, written against the public BSON
  * spec (bsonspec.org, version 1.1). Only the element types that can
  * appear in the engine's data model are supported; unknown element
  * types fail loudly so corrupt archives aren't silently mis-read.
  *
  * This backs the mongodump-archive container (SURVEY §2.1 "Archive",
  * reference layout doc `dump-parser/src/mongodb/mod.rs:53-91`); the
  * codec itself is a fresh implementation from the spec.
  */
object Bson {

  sealed trait BVal
  final case class BDouble(v: Double) extends BVal
  final case class BStr(v: String) extends BVal
  final case class BDoc(fields: Vector[(String, BVal)]) extends BVal {
    def get(name: String): Option[BVal] = fields.collectFirst { case (`name`, v) => v }
    def getStr(name: String): Option[String] = get(name).collect { case BStr(s) => s }
    def getInt(name: String): Option[Int] = get(name).collect {
      case BInt32(i) => i
      case BInt64(l) => l.toInt
    }
    def getLong(name: String): Option[Long] = get(name).collect {
      case BInt64(l) => l
      case BInt32(i) => i.toLong
    }
    def getBool(name: String): Option[Boolean] = get(name).collect { case BBool(b) => b }
  }
  final case class BArr(items: Vector[BVal]) extends BVal
  final case class BBin(subtype: Byte, bytes: Array[Byte]) extends BVal
  final case class BObjectId(bytes: Array[Byte]) extends BVal {
    require(bytes.length == 12, "ObjectId must be 12 bytes")
  }
  final case class BBool(v: Boolean) extends BVal
  final case class BDateTime(millis: Long) extends BVal
  case object BNull extends BVal
  final case class BInt32(v: Int) extends BVal
  final case class BTimestamp(v: Long) extends BVal
  final case class BInt64(v: Long) extends BVal

  /** BSON Decimal128 (element type 0x13): IEEE 754-2008 decimal128 in
    * the BID (binary integer decimal) encoding MongoDB uses. Held as
    * the raw 128 bits so EVERY payload — finite values, ±Infinity,
    * NaN, and non-canonical large coefficients — roundtrips
    * byte-exactly through the archive rewriter; [[toBigDecimal]] is the
    * lossy-only-for-specials bridge to Spark's DecimalType.
    * (The reference passes the type through untouched,
    * `replibyte/src/source/mongodb.rs:194-209`.)
    */
  final case class BDecimal128(high: Long, low: Long) extends BVal {
    import BDecimal128._

    private def comboTop2: Int = ((high >>> 61) & 0x3L).toInt
    def isNaN: Boolean = (high >>> 58 & 0x1fL) == 0x1fL
    def isInfinite: Boolean = (high >>> 58 & 0x1fL) == 0x1eL
    def isNegative: Boolean = (high >>> 63) != 0L

    /** Finite value as a BigDecimal (scale = -exponent, preserved
      * exactly); None for NaN/±Infinity. Non-canonical coefficients
      * (> 10^34-1) decode as zero, matching MongoDB's convention.
      */
    def toBigDecimal: Option[java.math.BigDecimal] =
      if (isNaN || isInfinite) None
      else {
        val (biasedExp, coeff) =
          if (comboTop2 == 0x3) {
            // "11" combination: implicit (0b100 << 111) coefficient
            // prefix — always exceeds 10^34-1, so the value is zero;
            // the exponent field shifts down two bits
            (((high >>> 47) & 0x3fffL).toInt, java.math.BigInteger.ZERO)
          } else {
            val c = java.math.BigInteger.valueOf(high & CoeffHighMask).shiftLeft(64)
              .or(unsignedLong(low))
            (((high >>> 49) & 0x3fffL).toInt,
              if (c.compareTo(MaxCoefficient) > 0) java.math.BigInteger.ZERO else c)
          }
        val signed = if (isNegative) coeff.negate() else coeff
        Some(new java.math.BigDecimal(signed, -(biasedExp - ExponentBias)))
      }

    /** Deterministic rendering for the widened-to-string fallback. */
    def render: String =
      if (isNaN) "NaN"
      else if (isInfinite) { if (isNegative) "-Infinity" else "Infinity" }
      else toBigDecimal.get.toPlainString
  }

  object BDecimal128 {
    val ExponentBias = 6176
    private val CoeffHighMask = (1L << 49) - 1
    private val MaxCoefficient = java.math.BigInteger.TEN.pow(34).subtract(java.math.BigInteger.ONE)

    private def unsignedLong(l: Long): java.math.BigInteger =
      new java.math.BigInteger(java.lang.Long.toUnsignedString(l))

    /** Encode a BigDecimal, preserving its scale (trailing zeros are
      * significant in decimal128) unless the coefficient is too wide,
      * in which case trailing zeros are shed; a value that still needs
      * more than 34 significant digits fails loudly rather than
      * rounding silently.
      */
    def fromBigDecimal(d: java.math.BigDecimal): BDecimal128 = {
      var unscaled = d.unscaledValue().abs()
      var exp = -d.scale()
      val ten = java.math.BigInteger.TEN
      while (unscaled.compareTo(MaxCoefficient) > 0 &&
             unscaled.mod(ten).signum() == 0 && exp < 6111) {
        unscaled = unscaled.divide(ten); exp += 1
      }
      require(unscaled.compareTo(MaxCoefficient) <= 0,
        s"decimal $d needs more than Decimal128's 34 significant digits")
      require(exp >= -ExponentBias && exp <= 6111,
        s"decimal $d exponent $exp outside Decimal128 range [-6176, 6111]")
      val biased = (exp + ExponentBias).toLong
      val coeffHigh = unscaled.shiftRight(64).longValueExact()
      val sign = if (d.signum() < 0) 1L << 63 else 0L
      BDecimal128(sign | (biased << 49) | coeffHigh, unscaled.longValue())
    }
  }

  object BDoc {
    def apply(fields: (String, BVal)*): BDoc = BDoc(fields.toVector)
  }

  // ---- encode ----

  def encode(doc: BDoc): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: ByteArrayOutputStream, doc: BDoc): Unit = {
    val body = new ByteArrayOutputStream()
    for ((name, v) <- doc.fields) writeElement(body, name, v)
    val bodyBytes = body.toByteArray
    // int32 total size = 4 (size) + body + 1 (trailing 0x00)
    writeInt32(out, bodyBytes.length + 5)
    out.write(bodyBytes, 0, bodyBytes.length)
    out.write(0x00)
  }

  private def writeElement(out: ByteArrayOutputStream, name: String, v: BVal): Unit = {
    def tag(t: Int): Unit = { out.write(t); writeCString(out, name) }
    v match {
      case BDouble(d)     => tag(0x01); writeInt64(out, java.lang.Double.doubleToLongBits(d))
      case BStr(s)        => tag(0x02); writeString(out, s)
      case d: BDoc        => tag(0x03); writeDoc(out, d)
      case BArr(items)    => tag(0x04)
        writeDoc(out, BDoc(items.zipWithIndex.map { case (x, i) => i.toString -> x }))
      case BBin(st, b)    => tag(0x05); writeInt32(out, b.length); out.write(st.toInt); out.write(b, 0, b.length)
      case BObjectId(b)   => tag(0x07); out.write(b, 0, 12)
      case BBool(b)       => tag(0x08); out.write(if (b) 1 else 0)
      case BDateTime(ms)  => tag(0x09); writeInt64(out, ms)
      case BNull          => tag(0x0A)
      case BInt32(i)      => tag(0x10); writeInt32(out, i)
      case BTimestamp(t)  => tag(0x11); writeInt64(out, t)
      case BInt64(l)      => tag(0x12); writeInt64(out, l)
      // 128-bit value little-endian: low quad first, then high
      case BDecimal128(h, l) => tag(0x13); writeInt64(out, l); writeInt64(out, h)
    }
  }

  private def writeCString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(!b.contains(0.toByte), s"BSON element name may not contain NUL: $s")
    out.write(b, 0, b.length); out.write(0x00)
  }

  private def writeString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeInt32(out, b.length + 1)
    out.write(b, 0, b.length); out.write(0x00)
  }

  private def writeInt32(out: ByteArrayOutputStream, i: Int): Unit = {
    out.write(i & 0xff); out.write((i >>> 8) & 0xff)
    out.write((i >>> 16) & 0xff); out.write((i >>> 24) & 0xff)
  }

  private def writeInt64(out: ByteArrayOutputStream, l: Long): Unit = {
    writeInt32(out, l.toInt); writeInt32(out, (l >>> 32).toInt)
  }

  // ---- decode ----

  /** Decode one document starting at `buf`'s current position; advances
    * the buffer past it.
    */
  def decode(buf: ByteBuffer): BDoc = {
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val start = buf.position()
    val size = buf.getInt
    require(size >= 5, s"invalid BSON document size $size")
    val fields = Vector.newBuilder[(String, BVal)]
    var t = buf.get()
    while (t != 0x00) {
      val name = readCString(buf)
      fields += name -> readValue(buf, t)
      t = buf.get()
    }
    require(buf.position() - start == size,
      s"BSON document size mismatch: declared $size, read ${buf.position() - start}")
    BDoc(fields.result())
  }

  def decode(bytes: Array[Byte]): BDoc = decode(ByteBuffer.wrap(bytes))

  private def readValue(buf: ByteBuffer, tag: Byte): BVal = tag match {
    case 0x01 => BDouble(java.lang.Double.longBitsToDouble(buf.getLong))
    case 0x02 => BStr(readString(buf))
    case 0x03 => decode(buf)
    case 0x04 =>
      val d = decode(buf)
      BArr(d.fields.map(_._2))
    case 0x05 =>
      val len = buf.getInt
      val st = buf.get()
      val b = new Array[Byte](len); buf.get(b)
      BBin(st, b)
    case 0x07 =>
      val b = new Array[Byte](12); buf.get(b)
      BObjectId(b)
    case 0x08 => BBool(buf.get() != 0)
    case 0x09 => BDateTime(buf.getLong)
    case 0x0A => BNull
    case 0x10 => BInt32(buf.getInt)
    case 0x11 => BTimestamp(buf.getLong)
    case 0x12 => BInt64(buf.getLong)
    case 0x13 =>
      val l = buf.getLong; val h = buf.getLong
      BDecimal128(h, l)
    case other => throw new IllegalArgumentException(
      f"unsupported BSON element type 0x$other%02x")
  }

  private def readCString(buf: ByteBuffer): String = {
    val out = new ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0x00) { out.write(b.toInt); b = buf.get() }
    new String(out.toByteArray, UTF_8)
  }

  private def readString(buf: ByteBuffer): String = {
    val len = buf.getInt
    require(len >= 1, s"invalid BSON string length $len")
    val b = new Array[Byte](len - 1); buf.get(b)
    require(buf.get() == 0x00, "BSON string missing NUL terminator")
    new String(b, UTF_8)
  }
}
