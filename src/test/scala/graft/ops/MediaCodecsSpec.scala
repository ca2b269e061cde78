package graft.ops

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import graft.ops.Multimodal.MediaRow

/** Known-answer tests for the pure-JVM media decoders: the fixtures are
  * crafted byte-by-byte IN the spec (independent encoders), and the
  * checksum oracle is recomputed here from the logical pixel/sample list —
  * so a decoder change that alters dimensions, channel order, row order,
  * or the hash recurrence fails loudly.
  */
class MediaCodecsSpec extends SparkSpec {

  import spark.implicits._

  // logical 2x2 test image, top-down row-major (r, g, b)
  private val pixels = Seq(
    (255, 0, 0), (0, 255, 0), // row 0: red, green
    (0, 0, 255), (10, 20, 30)) // row 1: blue, gray-ish

  private def expectedChecksum: Long = {
    var cs = 1125899906842597L
    pixels.foreach { case (r, g, b) => cs = ((cs * 31 + r) * 31 + g) * 31 + b }
    cs
  }

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }

  /** Independent BMP writer: 24 bpp, BI_RGB, 4-byte-aligned rows, BGR,
    * bottom-up when height > 0 / top-down when negative.
    */
  private def bmpBytes(width: Int, height: Int, topDown: Boolean): Array[Byte] = {
    val stride = ((width * 3 + 3) / 4) * 4
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    le32(out, 54 + stride * height) // file size
    le32(out, 0) // reserved
    le32(out, 54) // pixel offset
    le32(out, 40) // BITMAPINFOHEADER
    le32(out, width)
    le32(out, if (topDown) -height else height)
    le16(out, 1) // planes
    le16(out, 24) // bpp
    le32(out, 0) // BI_RGB
    le32(out, stride * height)
    le32(out, 0); le32(out, 0); le32(out, 0); le32(out, 0)
    val rowOrder = if (topDown) 0 until height else (height - 1) to 0 by -1
    rowOrder.foreach { row =>
      (0 until width).foreach { x =>
        val (r, g, b) = pixels(row * width + x)
        out.write(b); out.write(g); out.write(r)
      }
      (width * 3 until stride).foreach(_ => out.write(0)) // padding
    }
    out.toByteArray
  }

  /** Independent PPM P6 writer, with a header comment to exercise parsing. */
  private def ppmBytes(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P6\n# crafted fixture\n$width $height\n255\n".getBytes("US-ASCII"))
    pixels.foreach { case (r, g, b) => out.write(r); out.write(g); out.write(b) }
    out.toByteArray
  }

  private val samples = Seq(1000, -1000, 32767, -32768)

  /** Independent WAV writer: PCM 16-bit mono, with an odd-sized LIST chunk
    * between fmt and data to exercise word-aligned chunk skipping.
    */
  private def wavBytes(rate: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + 24 + 12 + 8 + dataLen) // riff payload size (approx; unchecked)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 16)
    le16(out, 1) // PCM
    le16(out, 1) // mono
    le32(out, rate)
    le32(out, rate * 2) // byte rate
    le16(out, 2) // block align
    le16(out, 16) // bits
    out.write("LIST".getBytes("US-ASCII")); le32(out, 3)
    out.write('I'); out.write('N'); out.write('F') // odd size → 1 pad byte
    out.write(0)
    out.write("data".getBytes("US-ASCII")); le32(out, dataLen)
    samples.foreach(le16(out, _))
    out.toByteArray
  }

  private def row(bytes: Array[Byte], format: String, id: Long = 7L) =
    MediaRow(id, bytes, format, 0, 0)

  test("BMP known answer: dimensions, channel means, pixel checksum") {
    val f = MediaCodecs.decode(row(bmpBytes(2, 2, topDown = false), "image/bmp"))
    assert(f.doc_id === 7L)
    assert(f.feature(3) === 2.0f && f.feature(4) === 2.0f) // width, height
    assert(f.feature(0) === 66.25f) // meanR = (255+0+0+10)/4
    assert(f.feature(1) === 68.75f) // meanG = (0+255+0+20)/4
    assert(f.feature(2) === 71.25f) // meanB = (0+0+255+30)/4
    assert(f.checksum === expectedChecksum)
    assert(f.n_bytes === bmpBytes(2, 2, topDown = false).length.toLong)
  }

  test("top-down and bottom-up BMP decode to the same logical image") {
    val up = MediaCodecs.decode(row(bmpBytes(2, 2, topDown = false), "bmp"))
    val down = MediaCodecs.decode(row(bmpBytes(2, 2, topDown = true), "bmp"))
    assert(up.checksum === down.checksum)
    assert(up.feature.toSeq === down.feature.toSeq)
  }

  test("PPM known answer matches BMP bit-for-bit (container-invariant identity)") {
    val ppm = MediaCodecs.decode(row(ppmBytes(2, 2), "image/x-portable-pixmap"))
    val bmp = MediaCodecs.decode(row(bmpBytes(2, 2, topDown = false), "image/bmp"))
    assert(ppm.checksum === expectedChecksum)
    assert(ppm.checksum === bmp.checksum)
    assert(ppm.feature.toSeq === bmp.feature.toSeq)
    assert(ppm.n_bytes !== bmp.n_bytes) // containers differ, content doesn't
  }

  test("WAV known answer: rms, peak, rate, channels, frames + sample checksum") {
    val f = MediaCodecs.decode(row(wavBytes(8000), "audio/wav"))
    val sumSq = samples.map(s => s.toDouble * s).sum
    val rms = math.sqrt(sumSq / samples.length) / 32768.0
    assert(f.feature(0) === rms.toFloat)
    assert(f.feature(1) === 1.0f) // peak -32768 → full scale
    assert(f.feature(2) === 8000.0f)
    assert(f.feature(3) === 1.0f)
    assert(f.feature(4) === samples.length.toFloat)
    var cs = 1125899906842597L
    samples.foreach(s => cs = cs * 31 + s)
    assert(f.checksum === cs)
  }

  test("malformed payloads fail loudly with context") {
    val truncated = bmpBytes(2, 2, topDown = false).take(40)
    val e1 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row(truncated, "image/bmp", id = 42L)))
    assert(e1.getMessage.contains("doc_id=42"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row("P6\n2 2\n".getBytes("US-ASCII"), "ppm")))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row("RIFFxxxxWAVE".getBytes("US-ASCII"), "wav")))
    assert(e3.getMessage.contains("missing fmt"), e3.getMessage)
  }

  test("overflow-hostile headers fail loudly, never crash or return silently") {
    // BMP width near Int.MaxValue/3: `width * 3` wraps negative in Int —
    // must be the contracted IllegalArgumentException, not an
    // ArrayIndexOutOfBounds from a bypassed bounds check (round-10 review)
    val hugeWidth = bmpBytes(2, 2, topDown = false)
    le32At(hugeWidth, 18, 800000000)
    val e1 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row(hugeWidth, "image/bmp", id = 7L)))
    assert(e1.getMessage.contains("doc_id=7"), e1.getMessage)
    // rawHeight = Int.MinValue survives math.abs as a NEGATIVE height: the
    // old `height == 0` guard passed and a zero-pixel feature row flowed
    // out silently
    val minHeight = bmpBytes(2, 2, topDown = false)
    le32At(minHeight, 22, Int.MinValue)
    val e2 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row(minHeight, "image/bmp")))
    assert(e2.getMessage.contains("bad dimensions"), e2.getMessage)
    // WAV chunk with size near Int.MaxValue: `pos + 8 + size` wraps
    // negative and escaped the Int-typed guard
    val wav = new ByteArrayOutputStream()
    wav.write("RIFF".getBytes("US-ASCII")); le32(wav, 100)
    wav.write("WAVE".getBytes("US-ASCII"))
    wav.write("data".getBytes("US-ASCII")); le32(wav, Int.MaxValue - 8)
    wav.write(new Array[Byte](64))
    val e3 = intercept[IllegalArgumentException](
      MediaCodecs.decode(row(wav.toByteArray, "wav")))
    assert(e3.getMessage.contains("out of bounds"), e3.getMessage)
  }

  private def le32At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >> 8) & 0xFF).toByte
    b(i + 2) = ((v >> 16) & 0xFF).toByte; b(i + 3) = ((v >> 24) & 0xFF).toByte
  }

  test("extractFeatures dispatches by format: real decode + stub fallback side by side") {
    val media = Seq(
      (1L, bmpBytes(2, 2, topDown = false), "image/bmp", 2, 2),
      (2L, ppmBytes(2, 2), "image/ppm", 2, 2),
      (3L, wavBytes(8000), "audio/wav", 0, 0),
      (4L, "plain text".getBytes("UTF-8"), "fake/utf8", 0, 0))
      .toDF("doc_id", "media", "format", "width", "height")
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).checksum === expectedChecksum)
    assert(feats(2L).checksum === expectedChecksum)
    assert(feats(3L).feature(2) === 8000.0f)
    // doc 4 took the stub path: 3-feature container-byte moments
    assert(feats(4L).feature.length === 3)
    assert(MediaCodecs.isDecodable("image/bmp") && !MediaCodecs.isDecodable("fake/utf8"))
  }
}
