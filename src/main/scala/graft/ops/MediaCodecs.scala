package graft.ops

/** Real pure-JVM media decoders for the trivial container formats that need
  * no external codec libraries: BMP (24-bit uncompressed), PPM (P6 binary),
  * and WAV (PCM 16-bit LE). These retire the one declared stub in
  * [[Multimodal]] — `decodeStub` remains the fallback for formats that DO
  * need a native codec (JPEG/MP4/...), which this container cannot host.
  *
  * Design contract shared by the image decoders: pixels are surfaced in
  * LOGICAL top-down row-major order, channels R,G,B — regardless of the
  * container's storage order (BMP stores bottom-up BGR, PPM top-down RGB).
  * The rolling checksum and channel means are computed over that normalized
  * stream, so the SAME image encoded as BMP and as PPM yields bit-identical
  * features and checksum (spec'd in MediaCodecsSpec) — exactly the property
  * a dedup/training pipeline wants from a decode stage: container-invariant
  * content identity.
  *
  * Malformed payloads fail loudly with the doc's context in the message —
  * a production pipeline routes these to quarantine via a try/route wrapper
  * (same pattern as the CSV ingest's bad-file quarantine); silently nulling
  * them would poison dedup keys downstream.
  *
  * All decoders are allocation-light single passes suitable for the
  * per-partition `mapPartitions` loop in [[Multimodal.extractFeatures]]:
  * no handle state is needed for these formats, so "open once per
  * partition" degenerates to plain per-row calls (the hook stays where a
  * JNI codec would need it).
  */
object MediaCodecs {

  import Multimodal.{MediaFeatures, MediaRow}

  /** Seed/step of the rolling content hash (same recurrence as
    * [[Multimodal.decodeStub]], but over DECODED content bytes, not
    * container bytes).
    */
  val HashSeed = 1125899906842597L

  /** Dispatch by declared format; unknown formats fall back to the stub
    * (container-byte moments) so unrecognized media still flows as
    * well-defined rows rather than dying mid-pipeline.
    */
  def decode(r: MediaRow): MediaFeatures = formatKey(r.format) match {
    case "bmp" => decodeBmp(r)
    case "ppm" => decodePpm(r)
    case "wav" => decodeWav(r)
    case _ => Multimodal.decodeStub(r)
  }

  /** True when [[decode]] has a real decoder for this format. */
  def isDecodable(format: String): Boolean = formatKey(format) != ""

  private def formatKey(format: String): String =
    Option(format).getOrElse("").toLowerCase match {
      case "bmp" | "image/bmp" | "image/x-ms-bmp" => "bmp"
      case "ppm" | "image/ppm" | "image/x-portable-pixmap" => "ppm"
      case "wav" | "audio/wav" | "audio/x-wav" | "audio/wave" => "wav"
      case _ => ""
    }

  private def fail(r: MediaRow, what: String): Nothing =
    throw new IllegalArgumentException(
      s"media decode failed for doc_id=${r.doc_id} format=${r.format}: $what")

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Accumulates the normalized pixel stream (top-down row-major, R,G,B):
    * rolling checksum + per-channel sums. Shared by both image decoders so
    * the container-invariance contract is enforced by construction.
    */
  private final class PixelAccumulator(width: Int, height: Int) {
    var checksum: Long = HashSeed
    var sumR, sumG, sumB: Double = 0.0
    def pixel(rr: Int, g: Int, b: Int): Unit = {
      checksum = (checksum * 31 + rr) * 31 + g
      checksum = checksum * 31 + b
      sumR += rr; sumG += g; sumB += b
    }
    def features(docId: Long, nBytes: Long): MediaFeatures = {
      val n = math.max(width.toLong * height, 1L).toDouble
      MediaFeatures(docId, nBytes, checksum,
        Array((sumR / n).toFloat, (sumG / n).toFloat, (sumB / n).toFloat,
          width.toFloat, height.toFloat))
    }
  }

  /** BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER, 24 bpp,
    * BI_RGB (uncompressed) only — the classic interchange subset. Rows are
    * 4-byte aligned and stored bottom-up unless height is negative
    * (top-down); pixel byte order in the container is B,G,R.
    */
  def decodeBmp(r: MediaRow): MediaFeatures = {
    val b = r.media
    if (b.length < 54) fail(r, s"truncated header (${b.length} bytes)")
    if (b(0) != 'B' || b(1) != 'M') fail(r, "bad magic (expected BM)")
    val pixelOffset = i32le(b, 10)
    val headerSize = i32le(b, 14)
    if (headerSize < 40) fail(r, s"unsupported DIB header size $headerSize")
    val width = i32le(b, 18)
    val rawHeight = i32le(b, 22)
    val topDown = rawHeight < 0
    // math.abs(Int.MinValue) is still negative: without the explicit
    // reject below, the row loop would run zero times and a syntactically
    // valid zero-pixel feature row would flow downstream silently — the
    // exact quiet poisoning this decoder's fail-loud contract forbids
    val height = math.abs(rawHeight)
    val bpp = u16le(b, 28)
    val compression = i32le(b, 30)
    if (bpp != 24) fail(r, s"unsupported bit depth $bpp (24 bpp only)")
    if (compression != 0) fail(r, s"compressed BMP (method $compression) unsupported")
    if (width <= 0 || height <= 0) fail(r, s"bad dimensions ${width}x$rawHeight")
    // stride/need in LONG: width near Int.MaxValue/3 wraps `width * 3`
    // negative in Int, which slips past the bounds check and turns a
    // malformed header into an uncontrolled ArrayIndexOutOfBounds instead
    // of the contracted doc_id-tagged failure (round-10 review)
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    val need = pixelOffset.toLong + strideL * height
    if (strideL > Int.MaxValue) fail(r, s"width $width overflows row stride")
    val stride = strideL.toInt
    if (pixelOffset < 54 || need > b.length)
      fail(r, s"pixel data out of bounds (need $need of ${b.length} bytes)")
    val acc = new PixelAccumulator(width, height)
    var row = 0
    while (row < height) {
      // normalize to top-down: bottom-up files store the LAST logical row first
      val storedRow = if (topDown) row else height - 1 - row
      var i = pixelOffset + storedRow * stride
      var x = 0
      while (x < width) {
        acc.pixel(b(i + 2) & 0xFF, b(i + 1) & 0xFF, b(i) & 0xFF) // B,G,R → R,G,B
        i += 3
        x += 1
      }
      row += 1
    }
    acc.features(r.doc_id, b.length.toLong)
  }

  /** PPM, binary P6 variant: ASCII header `P6 <width> <height> <maxval>`
    * (tokens separated by whitespace, `#` comments to end-of-line), then a
    * single whitespace byte, then width*height R,G,B triples. maxval ≤ 255
    * (1 byte per sample) only.
    */
  def decodePpm(r: MediaRow): MediaFeatures = {
    val b = r.media
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') fail(r, "bad magic (expected P6)")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < b.length &&
          (inComment || Character.isWhitespace(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      if (pos >= b.length) fail(r, "truncated header")
      var v = 0
      var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0')
        any = true
        pos += 1
      }
      if (!any) fail(r, s"expected integer at offset $pos")
      v
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    if (width <= 0 || height <= 0) fail(r, s"bad dimensions ${width}x$height")
    if (maxval <= 0 || maxval > 255) fail(r, s"unsupported maxval $maxval (1-byte samples only)")
    // exactly ONE whitespace byte separates header and raster
    if (pos >= b.length || !Character.isWhitespace(b(pos))) fail(r, "missing raster separator")
    pos += 1
    val need = pos.toLong + 3L * width * height
    if (need > b.length) fail(r, s"raster out of bounds (need $need of ${b.length} bytes)")
    val acc = new PixelAccumulator(width, height)
    var p = 0
    val nPix = width * height
    var i = pos
    while (p < nPix) {
      acc.pixel(b(i) & 0xFF, b(i + 1) & 0xFF, b(i + 2) & 0xFF)
      i += 3
      p += 1
    }
    acc.features(r.doc_id, b.length.toLong)
  }

  /** WAV: RIFF/WAVE container, `fmt ` chunk with PCM (format 1) 16-bit
    * samples, `data` chunk of interleaved LE int16 frames. Features are
    * audio-domain: [rms, peak, sample_rate, channels, frames] with rms/peak
    * normalized to [0, 1] by full scale (32768). Checksum rolls over the
    * frame-major interleaved sample values (channel order as stored), so it
    * is content identity independent of chunk layout or trailing metadata
    * chunks (LIST/INFO etc., which are skipped).
    */
  def decodeWav(r: MediaRow): MediaFeatures = {
    val b = r.media
    if (b.length < 12) fail(r, s"truncated header (${b.length} bytes)")
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      fail(r, "bad magic (expected RIFF/WAVE)")
    var pos = 12
    var channels = -1
    var sampleRate = -1
    var bitsPerSample = -1
    var dataStart = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (dataStart < 0 || channels < 0)) {
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32le(b, pos + 4)
      // compare in LONG: a declared size near Int.MaxValue wraps
      // `pos + 8 + size` negative and escapes an Int-typed guard (the
      // skip-chunk `pos` advance below is safe once this check holds)
      if (size < 0 || pos.toLong + 8 + size > b.length)
        fail(r, s"chunk '$id' out of bounds (size $size at offset $pos)")
      id match {
        case "fmt " =>
          if (size < 16) fail(r, s"fmt chunk too small ($size bytes)")
          val audioFormat = u16le(b, pos + 8)
          if (audioFormat != 1) fail(r, s"unsupported audio format $audioFormat (PCM only)")
          channels = u16le(b, pos + 10)
          sampleRate = i32le(b, pos + 12)
          bitsPerSample = u16le(b, pos + 22)
          if (bitsPerSample != 16) fail(r, s"unsupported bit depth $bitsPerSample (16-bit only)")
          if (channels <= 0 || sampleRate <= 0) fail(r, s"bad fmt: channels=$channels rate=$sampleRate")
        case "data" =>
          dataStart = pos + 8
          dataLen = size
        case _ => // LIST/INFO/fact/...: skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels < 0) fail(r, "missing fmt chunk")
    if (dataStart < 0) fail(r, "missing data chunk")
    val nSamples = dataLen / 2
    val frames = nSamples / channels
    var checksum = HashSeed
    var sumSq = 0.0
    var peak = 0
    var i = dataStart
    var s = 0
    while (s < nSamples) {
      val v = (u16le(b, i) << 16) >> 16 // sign-extend LE int16
      checksum = checksum * 31 + v
      sumSq += v.toDouble * v
      val a = math.abs(v)
      if (a > peak) peak = a
      i += 2
      s += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples) / 32768.0
    MediaFeatures(r.doc_id, b.length.toLong, checksum,
      Array(rms.toFloat, (peak / 32768.0).toFloat, sampleRate.toFloat,
        channels.toFloat, frames.toFloat))
  }
}
