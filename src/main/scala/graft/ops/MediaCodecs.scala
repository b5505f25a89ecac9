package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** A REAL [[MediaCodec]] for the two media container families that are
  * pure byte formats — decodable with zero external libraries, so the
  * Multimodal operators stop being a stub wherever payloads arrive in
  * them:
  *
  *   - Netpbm binary images (`P5` grayscale, `P6` RGB, maxval ≤ 255) —
  *     the uncompressed interchange format every image tool can write
  *     (`pnmtopng`/ImageMagick ship it; a crawler's thumbnail sidecar
  *     can too). Multi-image streams (images concatenated back to back,
  *     which the Netpbm spec explicitly allows) demux as frames.
  *   - RIFF/WAVE PCM audio (8-bit unsigned / 16-bit signed LE, any
  *     channel count) — the canonical uncompressed audio container.
  *     Fixed-length sample windows demux as frames.
  *
  * Everything is deterministic integer/byte arithmetic, so decoded
  * features are bit-identical across JVMs and mirror exactly into the
  * DuckDB oracles (`x_media_pnm_decode` / `x_media_pnm_resize` /
  * `x_media_wav_features`). Formats the codec does not recognize raise
  * with a sniff report instead of fabricating output — compressed
  * codecs (JPEG, MP3, H.264) still need a deployment-provided
  * [[MediaCodec]]; this class only removes the stub for the
  * uncompressed tier.
  *
  * Media semantics of the shared trait interface:
  *   - images: `(width, height, feature)` with feature(0) = mean
  *     luminance (RGB averaged per pixel), feature(1..8) = the
  *     32-wide luminance histogram mass per bin (counts, as exact
  *     doubles).
  *   - audio: `(samplesPerChannel, channels, feature)` with feature =
  *     [mean sample, mean |sample|, zero crossings, sample rate] over
  *     the interleaved stream.
  */
final class NetpbmWavCodec(frameSamples: Int = 1024) extends MediaCodec {

  import NetpbmWavCodec._

  def decode(bytes: Array[Byte], mediaType: String): (Int, Int, Array[Double]) =
    sniff(bytes, mediaType) match {
      case Pnm =>
        val img = pnmParse(bytes, 0)
        val lum = img.luminances
        val hist = new Array[Double](8)
        var sum = 0L
        var i = 0
        while (i < lum.length) { sum += lum(i); hist(lum(i) >> 5) += 1; i += 1 }
        val mean = if (lum.isEmpty) 0.0 else sum.toDouble / lum.length.toDouble
        (img.w, img.h, mean +: hist)
      case Wav =>
        val wav = wavParse(bytes)
        val s = wav.samples
        var sum = 0L; var absSum = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          sum += s(i); absSum += math.abs(s(i).toLong)
          if (i > 0 && (s(i).toLong * s(i - 1)) < 0) zc += 1
          i += 1
        }
        val n = s.length.toDouble
        val feats = Array(
          if (s.isEmpty) 0.0 else sum.toDouble / n,
          if (s.isEmpty) 0.0 else absSum.toDouble / n,
          zc.toDouble, wav.sampleRate.toDouble)
        (if (wav.channels == 0) 0 else s.length / wav.channels, wav.channels, feats)
    }

  def resize(bytes: Array[Byte], mediaType: String, width: Int, height: Int): Array[Byte] =
    sniff(bytes, mediaType) match {
      case Pnm =>
        val img = pnmParse(bytes, 0)
        // nearest-neighbor: srcX = floor(x · srcW / dstW) — the exact
        // integer map the resize oracle mirrors
        val ch = img.channels
        if (img.w == 0 || img.h == 0)
          return pnmEncode(img.magic, 0, 0, Array.empty)
        val outRaster = new Array[Byte](width * height * ch)
        var y = 0
        while (y < height) {
          val sy = (y.toLong * img.h / height).toInt
          var x = 0
          while (x < width) {
            val sx = (x.toLong * img.w / width).toInt
            var c = 0
            while (c < ch) {
              outRaster((y * width + x) * ch + c) = img.raster((sy * img.w + sx) * ch + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        pnmEncode(img.magic, width, height, outRaster)
      case Wav =>
        val wav = wavParse(bytes)
        val ch = math.max(1, wav.channels)
        val perCh = wav.samples.length / ch
        if (perCh == 0) return wavEncode(wav.copy(samples = Array.empty))
        val outSamples = new Array[Int](width * ch)
        var i = 0
        while (i < width) {
          val si = (i.toLong * perCh / width).toInt
          var c = 0
          while (c < ch) { outSamples(i * ch + c) = wav.samples(si * ch + c); c += 1 }
          i += 1
        }
        wavEncode(wav.copy(samples = outSamples))
    }

  def frames(bytes: Array[Byte], mediaType: String): Iterator[Array[Byte]] =
    sniff(bytes, mediaType) match {
      case Pnm =>
        // Netpbm streams may concatenate images back to back — each is
        // one frame, re-encoded standalone
        Iterator.unfold(0) { off =>
          if (off >= bytes.length) None
          else {
            val img = pnmParse(bytes, off)
            Some((pnmEncode(img.magic, img.w, img.h, img.raster), img.end))
          }
        }
      case Wav =>
        val wav = wavParse(bytes)
        val ch = math.max(1, wav.channels)
        val stride = frameSamples * ch
        val nFrames = math.max(1, (wav.samples.length + stride - 1) / stride)
        (0 until nFrames).iterator.map { f =>
          val from = f * stride
          val to = math.min(wav.samples.length, from + stride)
          wavEncode(wav.copy(samples = java.util.Arrays.copyOfRange(wav.samples, from, to)))
        }
    }

  def luminances(bytes: Array[Byte], mediaType: String): (Int, Int, Array[Int]) =
    sniff(bytes, mediaType) match {
      case Pnm =>
        val img = pnmParse(bytes, 0)
        (img.w, img.h, img.luminances)
      case Wav =>
        // audio has no luminance plane: rescale PCM-16 to 0..255 so the
        // perceptual-hash path degrades gracefully instead of throwing
        val wav = wavParse(bytes)
        val lum = wav.samples.map(s => (s + 32768) >> 8)
        (if (wav.channels == 0) 0 else lum.length / wav.channels, wav.channels, lum)
    }

  override def samples(bytes: Array[Byte], mediaType: String): (Int, Array[Int]) =
    sniff(bytes, mediaType) match {
      case Wav =>
        val wav = wavParse(bytes)
        (wav.channels, wav.samples)
      case Pnm => throw new IllegalArgumentException(
        "raw-sample decode asked of an image payload")
    }
}

object NetpbmWavCodec {

  private sealed trait Format
  private case object Pnm extends Format
  private case object Wav extends Format

  /** Magic bytes first, declared type as the tie-break — a payload
    * that is neither is an error, never a fabricated result.
    */
  private def sniff(bytes: Array[Byte], mediaType: String): Format = {
    if (bytes.length >= 2 && bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6')) Pnm
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') Wav
    else if (mediaType != null && mediaType.startsWith("image/x-portable")) Pnm
    else if (mediaType != null && (mediaType.startsWith("audio/wav") ||
      mediaType.startsWith("audio/x-wav"))) Wav
    else throw new IllegalArgumentException(
      s"NetpbmWavCodec: unrecognized payload (type=$mediaType, " +
        s"head=${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString}) — " +
        "supported: Netpbm P5/P6, RIFF/WAVE PCM; other codecs need a real MediaCodec impl")
  }

  private final case class PnmImage(magic: Char, w: Int, h: Int, maxval: Int,
                                    raster: Array[Byte], end: Int) {
    def channels: Int = if (magic == '6') 3 else 1
    /** Per-pixel luminance 0..255: the gray byte (P5) or the integer
      * mean of R,G,B (P6 — floor((r+g+b)/3), exact).
      */
    def luminances: Array[Int] = {
      val out = new Array[Int](w * h)
      if (magic == '5') {
        var i = 0
        while (i < out.length) { out(i) = raster(i) & 0xff; i += 1 }
      } else {
        var i = 0
        while (i < out.length) {
          out(i) = ((raster(3 * i) & 0xff) + (raster(3 * i + 1) & 0xff) +
            (raster(3 * i + 2) & 0xff)) / 3
          i += 1
        }
      }
      out
    }
  }

  /** Parse one binary Netpbm image starting at `off`: magic, then
    * whitespace-separated width/height/maxval tokens (with `#` comments
    * swallowed to end of line), then EXACTLY one whitespace byte, then
    * the raster — the format's actual grammar, not a simplification.
    */
  private def pnmParse(bytes: Array[Byte], off: Int): PnmImage = {
    require(off + 2 <= bytes.length && bytes(off) == 'P' &&
      (bytes(off + 1) == '5' || bytes(off + 1) == '6'),
      s"not a binary Netpbm image at offset $off")
    val magic = bytes(off + 1).toChar
    var p = off + 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (p < bytes.length && (inComment || isSpace(bytes(p)) || bytes(p) == '#')) {
        if (bytes(p) == '#') inComment = true
        else if (bytes(p) == '\n') inComment = false
        p += 1
      }
      var v = 0
      require(p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9',
        s"malformed Netpbm header near offset $p")
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0'); p += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval > 0 && maxval <= 255,
      s"only 1-byte-per-sample Netpbm supported (maxval ≤ 255), got $maxval")
    require(p < bytes.length && isSpace(bytes(p)), "missing raster separator")
    p += 1 // the single whitespace byte before the raster
    // Long arithmetic: w·h·channels for a malformed header can exceed
    // Int range and wrap — the bound check must see the true product
    val nL = w.toLong * h.toLong * (if (magic == '6') 3L else 1L)
    require(p.toLong + nL <= bytes.length,
      s"truncated Netpbm raster: need $nL bytes at $p, have ${bytes.length - p}")
    val n = nL.toInt
    PnmImage(magic, w, h, maxval, java.util.Arrays.copyOfRange(bytes, p, p + n), p + n)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  private def pnmEncode(magic: Char, w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
    val header = s"P$magic\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raster, 0, out, header.length, raster.length)
    out
  }

  private final case class WavData(channels: Int, sampleRate: Int, bits: Int,
                                   samples: Array[Int])

  /** Parse a RIFF/WAVE container: walk the chunk list (honoring the
    * odd-size pad byte), take format from `fmt ` (PCM only) and samples
    * from `data` — unknown chunks (LIST, fact, cue) skip cleanly, as a
    * real reader must.
    */
  private def wavParse(bytes: Array[Byte]): WavData = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated RIFF header")
    require(bb.getInt(0) == 0x46464952, "not a RIFF container") // "RIFF"
    require(bb.getInt(8) == 0x45564157, "not a WAVE form")      // "WAVE"
    var p = 12
    var channels = 0; var rate = 0; var bits = 0
    var samples: Array[Int] = null
    while (p + 8 <= bytes.length) {
      val ckId = bb.getInt(p)
      val ckLen = bb.getInt(p + 4)
      val body = p + 8
      // Long arithmetic: a huge declared ckLen must fail here with the
      // truncation message, not Int-overflow negative and "pass"
      require(ckLen >= 0 && body.toLong + ckLen <= bytes.length,
        s"truncated WAV chunk at offset $p")
      if (ckId == 0x20746d66) { // "fmt "
        require(ckLen >= 16, "short fmt chunk")
        val audioFormat = bb.getShort(body) & 0xffff
        require(audioFormat == 1, s"only PCM WAV supported, got format $audioFormat")
        channels = bb.getShort(body + 2) & 0xffff
        rate = bb.getInt(body + 4)
        bits = bb.getShort(body + 14) & 0xffff
        require(bits == 8 || bits == 16, s"only 8/16-bit PCM supported, got $bits")
      } else if (ckId == 0x61746164) { // "data"
        require(bits != 0, "WAV data chunk before fmt chunk")
        val n = if (bits == 16) ckLen / 2 else ckLen
        samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            if (bits == 16) bb.getShort(body + 2 * i).toInt
            else (bytes(body + i) & 0xff) - 128 // 8-bit WAV is unsigned
          i += 1
        }
      }
      p = body + ckLen + (ckLen & 1) // chunks pad to even length
    }
    require(samples != null, "WAV has no data chunk")
    WavData(channels, rate, bits, samples)
  }

  private def wavEncode(w: WavData): Array[Byte] = {
    val bytesPerSample = w.bits / 8
    val dataLen = w.samples.length * bytesPerSample
    val out = new ByteArrayOutputStream(44 + dataLen)
    val bb = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    val blockAlign = math.max(1, w.channels) * bytesPerSample
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(w.channels.toShort).putInt(w.sampleRate)
      .putInt(w.sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(w.bits.toShort)
    bb.putInt(0x61746164).putInt(dataLen)
    out.write(bb.array())
    val data = ByteBuffer.allocate(dataLen).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < w.samples.length) {
      if (w.bits == 16) data.putShort(w.samples(i).toShort)
      else data.put((w.samples(i) + 128).toByte)
      i += 1
    }
    out.write(data.array())
    out.toByteArray
  }

  /** Build a standalone PCM-16 mono WAV from samples — the test-harness
    * producer ([[graft.ops.Multimodal.packText]]'s audio analog).
    */
  def wavOf(samples: Array[Int], sampleRate: Int = 8000, channels: Int = 1): Array[Byte] =
    wavEncode(WavData(channels, sampleRate, 16, samples))
}
