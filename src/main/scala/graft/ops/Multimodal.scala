package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * Decoding is REAL for the codec-free container formats — BMP (24-bit),
  * PPM (P6), WAV (16-bit PCM) — via the pure-JVM decoders in
  * [[MediaCodecs]]; formats that need native codecs (JPEG/MP4/...) fall
  * back to [[Multimodal.decodeStub]] (byte-histogram moments over the
  * container bytes), since those libraries aren't in this container.
  * Everything Spark-side is shared: the schema (binary payload + typed
  * metadata), the typed Dataset boundary, the per-partition iteration
  * (where a JNI decoder handle would be opened once per partition and
  * reused across rows), and the deterministic feature output shape.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows —
  * repartition by a size-balanced key before decode so one executor doesn't
  * get all the 4K videos, and keep `spark.sql.files.maxPartitionBytes`
  * small enough that a partition of payloads fits in executor memory.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], format: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long, feature: Array[Float])

  /** Deterministic fake media table derived from documents: payload = utf8
    * bytes of the text, metadata derived from doc stats. Stands in for a
    * real (path, bytes, metadata) ingest of image/audio files.
    */
  def asMediaTable(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // null text → empty payload, not a null media row: MediaRow's Int
    // width/height are non-nullable in the encoder and decodeStub
    // dereferences media — one null document would kill the whole job
    // (review r9); an empty payload flows through every stage as a
    // well-defined zero-feature row instead
    val t = coalesce(col(textCol), lit(""))
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      t.cast("binary").as("media"),
      lit("fake/utf8").as("format"),
      (length(t) % 640).cast("int").as("width"),
      (length(t) % 480).cast("int").as("height"))
  }

  /** Fallback for formats without a pure-JVM decoder (a production build
    * would call JNI into libjpeg/ffmpeg here; see [[MediaCodecs.decode]]
    * for the formats decoded for real). Deterministic — byte-histogram
    * moments over the container payload — so tests can assert exact values
    * and unknown formats still flow as well-defined rows.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.media
    var checksum = 1125899906842597L // deterministic FNV-ish rolling hash
    var sum = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      checksum = checksum * 31 + b
      sum += b
      sumSq += b.toDouble * b
      i += 1
    }
    val n = math.max(bytes.length, 1)
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    MediaFeatures(r.doc_id, bytes.length.toLong, checksum,
      Array(mean.toFloat, variance.toFloat, bytes.length.toFloat))
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte], n_bytes: Long)

  /** Frame sampling: split each payload into fixed-size chunks ("frames" —
    * the stub stands in for video keyframe extraction) keeping every
    * `everyN`-th. Row-expanding op: a media row becomes ≤ payload/frameSize
    * frame rows, so downstream stages repartition — frames of one doc need
    * no co-location. STUB boundary is the chunking rule only; the iterator
    * shape (lazy flatMap, no per-partition buffering of all frames) is the
    * real pattern for payloads that dwarf executor memory.
    */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, everyN: Int = 2): Dataset[Frame] = {
    val ds = media.select("doc_id", "media", "format", "width", "height")
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        r.media.grouped(frameSize).zipWithIndex
          .collect { case (chunk, i) if i % everyN == 0 =>
            Frame(r.doc_id, i, chunk, chunk.length.toLong)
          }
      }
    }(Encoders.product[Frame])
  }

  /** Feature extraction over the media table: typed mapPartitions so a real
    * decoder is initialized once per partition, not once per row. Dispatches
    * per row on the declared format — BMP/PPM/WAV decode for real
    * ([[MediaCodecs.decode]]), anything else takes the stub path.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val ds = media.select("doc_id", "media", "format", "width", "height")
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      // a JNI codec would open its handle here, close via iterator
      // completion; the pure-JVM decoders are stateless
      rows.map(MediaCodecs.decode)
    }(Encoders.product[MediaFeatures])
  }
}
