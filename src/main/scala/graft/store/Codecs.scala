package graft.store

import java.io.ByteArrayOutputStream
import java.security.SecureRandom
import java.util.zip.{Deflater, Inflater}

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** X1/X2: chunk codecs — zlib compression and AES-256-GCM encryption.
  *
  * Mirrors the reference's datastore codecs
  * (`replibyte/src/datastore/mod.rs:178-230`) with one deliberate fix:
  * the reference uses a FIXED nonce (`datastore/mod.rs:208`), which
  * breaks GCM's security guarantees; here every chunk gets a fresh
  * random 12-byte nonce, prepended to the ciphertext. Key
  * padding/truncation to 32 bytes matches
  * `get_encryption_key_with_correct_length` (`datastore/mod.rs:191-202`)
  * for key-handling compatibility.
  */
object Codecs {

  def compress(data: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(data)
    deflater.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 4))
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val inflater = new Inflater()
    inflater.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    while (!inflater.finished()) {
      val n = inflater.inflate(buf)
      if (n == 0 && inflater.needsInput()) throw new java.util.zip.DataFormatException("truncated zlib stream")
      out.write(buf, 0, n)
    }
    inflater.end()
    out.toByteArray
  }

  /** Pad/truncate a passphrase to exactly 32 bytes (AES-256), matching
    * the reference's key normalization.
    */
  def normalizeKey(key: String): Array[Byte] = {
    val bytes = key.getBytes("UTF-8")
    java.util.Arrays.copyOf(bytes, 32)
  }

  private val NonceLen = 12
  private val TagBits = 128
  private val rng = new SecureRandom()

  def encrypt(data: Array[Byte], key: String): Array[Byte] = {
    val nonce = new Array[Byte](NonceLen)
    rng.nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE,
      new SecretKeySpec(normalizeKey(key), "AES"), new GCMParameterSpec(TagBits, nonce))
    val ct = cipher.doFinal(data)
    val out = new Array[Byte](NonceLen + ct.length)
    System.arraycopy(nonce, 0, out, 0, NonceLen)
    System.arraycopy(ct, 0, out, NonceLen, ct.length)
    out
  }

  def decrypt(data: Array[Byte], key: String): Array[Byte] = {
    val nonce = java.util.Arrays.copyOfRange(data, 0, NonceLen)
    val ct = java.util.Arrays.copyOfRange(data, NonceLen, data.length)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(normalizeKey(key), "AES"), new GCMParameterSpec(TagBits, nonce))
    cipher.doFinal(ct)
  }

  /** Outbound chunk pipeline: compress → encrypt (order matches the
    * reference: `datastore/local_disk.rs:111-174`).
    */
  def encode(data: Array[Byte], compressed: Boolean, encryptionKey: Option[String]): Array[Byte] = {
    val c = if (compressed) compress(data) else data
    encryptionKey.fold(c)(k => encrypt(c, k))
  }

  def decode(data: Array[Byte], compressed: Boolean, encryptionKey: Option[String]): Array[Byte] = {
    val d = encryptionKey.fold(data)(k => decrypt(data, k))
    if (compressed) decompress(d) else d
  }
}

/** G4: CRC64-ECMA checksum (the reference recomputes it per rewritten
  * Mongo collection, `dump-parser/src/mongodb/mod.rs:213-233`).
  * Table-driven, processes byte arrays incrementally; order-sensitive by
  * nature, so distributed use checksums each chunk/part independently
  * (the part file is the unit of integrity, like the reference's
  * per-collection streams).
  */
object Crc64 {
  private val Poly = 0xC96C5795D7870F42L // ECMA-182, reflected
  private val table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1L) != 0) (crc >>> 1) ^ Poly else crc >>> 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  def of(bytes: Array[Byte]): Long = update(0L, bytes)

  def update(crc0: Long, bytes: Array[Byte]): Long = {
    var crc = ~crc0
    var i = 0
    while (i < bytes.length) {
      crc = table(((crc ^ bytes(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    ~crc
  }

  /** CRC of a concatenation A++B from crc(A), crc(B) and |B| alone —
    * zlib's `crc32_combine` construction (Mark Adler's public GF(2)
    * matrix method) lifted to the 64-bit reflected polynomial: advance
    * crc(A) through |B| zero bytes by exponentiating the one-bit-shift
    * operator, then XOR crc(B). O(log |B|) squarings of a 64×64 bit
    * matrix; the enabler for DISTRIBUTED writes — executors CRC their
    * own chunks, the driver folds the per-chunk (crc, length) pairs
    * without ever re-reading the bytes.
    */
  def combine(crcA: Long, crcB: Long, lenB: Long): Long = {
    require(lenB >= 0, s"negative chunk length: $lenB")
    if (lenB == 0) return crcA
    def times(mat: Array[Long], vec0: Long): Long = {
      var sum = 0L; var vec = vec0; var i = 0
      while (vec != 0) {
        if ((vec & 1L) != 0) sum ^= mat(i)
        vec >>>= 1; i += 1
      }
      sum
    }
    def square(dst: Array[Long], src: Array[Long]): Unit = {
      var i = 0
      while (i < 64) { dst(i) = times(src, src(i)); i += 1 }
    }
    // odd = the shift-by-one-bit operator in the reflected domain
    val odd = new Array[Long](64)
    odd(0) = Poly
    var row = 1L
    var n = 1
    while (n < 64) { odd(n) = row; row <<= 1; n += 1 }
    val even = new Array[Long](64)
    square(even, odd) // 2 bits
    square(odd, even) // 4 bits
    var crc = crcA
    var len = lenB
    var done = false
    while (!done) {
      square(even, odd) // first pass: 8 bits = one zero byte
      if ((len & 1L) != 0) crc = times(even, crc)
      len >>>= 1
      if (len == 0) done = true
      else {
        square(odd, even)
        if ((len & 1L) != 0) crc = times(odd, crc)
        len >>>= 1
        if (len == 0) done = true
      }
    }
    crc ^ crcB
  }
}
