package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct; decode / feature-extraction runs as a
  * partition-local batch transform (the Scala analog of a Pandas-UDF
  * `mapInPandas` stage — executors stream batches through the decoder, no
  * driver involvement, arbitrary native libs could be called inside).
  *
  * The decode step is a REAL row-local parse of public container formats —
  * PNG (IHDR: width/height/bit-depth), GIF (logical screen descriptor) and
  * WAV (fmt chunk: channels/sample-rate + data-chunk duration) — pure JVM,
  * no codec libraries. Pixel/sample decode (what a JPEG decoder or
  * resampler would do) is out of scope for this engine; the parse covers
  * exactly the metadata a training-data pipeline filters and shards on.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Parsed container metadata. Fields that do not apply to a format are 0
    * (not null) so cross-engine hashing of the frame stays trivial:
    * images have width/height/bit_depth, audio has channels/sample_rate/
    * duration_ms. `media_kind` is
    * "png" | "gif" | "jpeg" | "wav" | "mp3" | "unknown".
    */
  final case class MediaMeta(
      doc_id: Long, media_kind: String, byte_len: Long,
      width: Long, height: Long, bit_depth: Long,
      channels: Long, sample_rate: Long, duration_ms: Long)

  /** Wrap a text corpus as opaque media payloads with typed metadata. */
  def toMediaFrame(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  // ------------------------------------------------------------ parsers

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  private val pngSignature = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per the
    * spec): 4-byte length, "IHDR", width/height as big-endian u32, then
    * bit-depth and color-type bytes. Returns (width, height, bitDepth).
    */
  def parsePng(b: Array[Byte]): Option[(Long, Long, Long)] =
    if (b.length < 29 || !b.take(8).sameElements(pngSignature) || !ascii(b, 12, "IHDR")) None
    else Some((be32(b, 16), be32(b, 20), (b(24) & 0xff).toLong))

  /** GIF87a/GIF89a: 6-byte signature then the logical screen descriptor —
    * width/height as little-endian u16 and a packed byte whose bits 4-6
    * hold (color resolution - 1). Returns (width, height, colorResBits).
    */
  def parseGif(b: Array[Byte]): Option[(Long, Long, Long)] =
    if (b.length < 13 || !(ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))) None
    else Some((le16(b, 6).toLong, le16(b, 8).toLong, (((b(10) & 0xff) >> 4) & 7).toLong + 1))

  /** RIFF/WAVE: walks the chunk list for "fmt " (channels u16 LE,
    * sample rate u32 LE, byte rate u32 LE) and "data" (payload size);
    * duration_ms = dataSize * 1000 / byteRate. Returns
    * (channels, sampleRate, durationMs).
    */
  def parseWav(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
    var channels = 0L; var rate = 0L; var byteRate = 0L
    var dataLen = -1L
    // the walk is in LONG space: an LE size is 0..0xFFFFFFFF, so the index
    // strictly advances by ≥ 8 each step and an oversize/truncated chunk
    // simply runs the index past the buffer and ends the loop — metadata
    // from chunks parsed so far is KEPT (a WAV truncated in storage still
    // reports its declared duration, like any header-only parser). The
    // naive Int walk spun forever on 0xFFFFFFF8 (-8 as Int).
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = le32(b, at + 4) // 0..0xFFFFFFFF as Long
      if (ascii(b, at, "fmt ") && at + 24 <= b.length) {
        channels = le16(b, at + 10).toLong
        rate = le32(b, at + 12)
        byteRate = le32(b, at + 16)
      } else if (ascii(b, at, "data")) {
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      i += 8L + size + (size & 1L)
    }
    if (rate == 0 || byteRate == 0 || dataLen < 0) None
    else Some((channels, rate, dataLen * 1000L / byteRate))
  }

  /** JPEG: SOI (FFD8) then a marker walk — each segment is FF, a type
    * byte, and (for non-standalone markers) a big-endian u16 length that
    * INCLUDES the length field. The frame header is any SOF marker
    * (C0-CF except C4 DHT / C8 JPG-extension / CC DAC): precision byte,
    * height u16 BE, width u16 BE. Returns (width, height, precision).
    * The walk advances by ≥ 2 bytes per step (a declared length < 2 is
    * malformed and aborts), so it terminates on any input.
    */
  def parseJpeg(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
      // fill bytes: FF may repeat before the marker type
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val m = b(j) & 0xff
      if (m >= 0xd0 && m <= 0xd9) { i = j + 1 } // RSTn/SOI/EOI: standalone
      else {
        // the 2-byte length needs b(j+1) AND b(j+2): fill-byte runs can
        // push j to the last byte, where the old j+1 bound still let
        // be16 read one past the end
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          return if (j + 8 > b.length) None
          else Some((be16(b, j + 6).toLong, be16(b, j + 4).toLong, (b(j + 3) & 0xff).toLong))
        }
        i = j + 1 + len
      }
    }
    None
  }

  // MPEG-1 Layer III bitrate (kbps) and sample-rate tables, indexed by the
  // frame-header fields (public ISO/IEC 11172-3 tables; 0 = invalid/free)
  private val mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val mp3Rates = Array(44100, 48000, 32000, 0)

  /** MP3 (MPEG-1 Layer III frame header at offset 0): 11-bit sync, then
    * version/layer/bitrate/sample-rate/channel-mode fields. Returns
    * (channels, sampleRate, durationMs) with duration computed CBR-style
    * from the total byte length and the frame bitrate — exactly what a
    * header-only scanner can know without walking every frame.
    */
  def parseMp3(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 4) return None
    val b1 = b(1) & 0xff
    if ((b(0) & 0xff) != 0xff || (b1 & 0xe0) != 0xe0) return None
    val version = (b1 >> 3) & 3 // 3 = MPEG-1
    val layer = (b1 >> 1) & 3   // 1 = Layer III
    if (version != 3 || layer != 1) return None
    val b2 = b(2) & 0xff
    val kbps = mp3Bitrates((b2 >> 4) & 0xf)
    val rate = mp3Rates((b2 >> 2) & 3)
    if (kbps == 0 || rate == 0) return None
    val channels = if (((b(3) & 0xff) >> 6) == 3) 1L else 2L // 3 = mono
    Some((channels, rate.toLong, b.length.toLong * 8000L / (kbps.toLong * 1000L)))
  }

  /** Real row-local decode: sniff the container by magic bytes and parse
    * its header. Unknown/truncated payloads degrade to kind "unknown" with
    * zeroed fields — a malformed blob must never fail the batch.
    */
  def decodeMeta(r: MediaRecord): MediaMeta = {
    val b = if (r.payload == null) Array.emptyByteArray else r.payload
    val blen = b.length.toLong
    parsePng(b).map { case (w, h, d) =>
      MediaMeta(r.doc_id, "png", blen, w, h, d, 0L, 0L, 0L)
    }.orElse(parseGif(b).map { case (w, h, d) =>
      MediaMeta(r.doc_id, "gif", blen, w, h, d, 0L, 0L, 0L)
    }).orElse(parseJpeg(b).map { case (w, h, d) =>
      MediaMeta(r.doc_id, "jpeg", blen, w, h, d, 0L, 0L, 0L)
    }).orElse(parseWav(b).map { case (c, sr, ms) =>
      MediaMeta(r.doc_id, "wav", blen, 0L, 0L, 0L, c, sr, ms)
    }).orElse(parseMp3(b).map { case (c, sr, ms) =>
      MediaMeta(r.doc_id, "mp3", blen, 0L, 0L, 0L, c, sr, ms)
    }).getOrElse(MediaMeta(r.doc_id, "unknown", blen, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  /** Partition-local batch feature extraction (mapPartitions = the batched
    * UDF boundary; one decoder instance per task, streaming).
    */
  def decodeFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeMeta))
  }

  // ------------------------------------------------------------ builders

  /** Minimal REAL PNG: signature + a spec-correct IHDR chunk (length,
    * type, 13-byte payload, CRC32 over type+payload) + the filler appended
    * as opaque trailing bytes. Header parsers (including [[parsePng]])
    * read it exactly as a PNG of these dimensions.
    */
  def buildPng(width: Int, height: Int, bitDepth: Int, filler: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + filler.length)
    out.write(pngSignature, 0, 8)
    val ihdr = new Array[Byte](17)
    "IHDR".getBytes("US-ASCII").copyToArray(ihdr, 0)
    def putBe32(a: Array[Byte], i: Int, v: Long): Unit = {
      a(i) = ((v >> 24) & 0xff).toByte; a(i + 1) = ((v >> 16) & 0xff).toByte
      a(i + 2) = ((v >> 8) & 0xff).toByte; a(i + 3) = (v & 0xff).toByte
    }
    putBe32(ihdr, 4, width.toLong); putBe32(ihdr, 8, height.toLong)
    ihdr(12) = bitDepth.toByte
    ihdr(13) = 6 // color type RGBA
    // compression/filter/interlace = 0
    val lenAndCrc = new Array[Byte](4)
    putBe32(lenAndCrc, 0, 13L); out.write(lenAndCrc, 0, 4)
    out.write(ihdr, 0, 17)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr, 0, 17)
    putBe32(lenAndCrc, 0, crc.getValue); out.write(lenAndCrc, 0, 4)
    out.write(filler, 0, filler.length)
    out.toByteArray
  }

  /** Minimal REAL GIF89a header: signature + logical screen descriptor
    * (LE width/height, packed color-resolution bits = 8, no global color
    * table) + filler as trailing bytes. 13-byte header.
    */
  def buildGif(width: Int, height: Int, filler: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](13 + filler.length)
    "GIF89a".getBytes("US-ASCII").copyToArray(out, 0)
    out(6) = (width & 0xff).toByte; out(7) = ((width >> 8) & 0xff).toByte
    out(8) = (height & 0xff).toByte; out(9) = ((height >> 8) & 0xff).toByte
    out(10) = 0x70.toByte // color resolution bits = 7 → 8-bit
    filler.copyToArray(out, 13)
    out
  }

  /** Minimal REAL JPEG: SOI + a single-component SOF0 frame header
    * (FF C0, length 11, precision byte, BE height, BE width, 1 component
    * of 3 descriptor bytes) + filler as opaque trailing bytes. 15-byte
    * header; [[parseJpeg]] reads it exactly as a JPEG of these dimensions.
    */
  def buildJpeg(width: Int, height: Int, precision: Int, filler: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](15 + filler.length)
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte // SOI
    out(2) = 0xff.toByte; out(3) = 0xc0.toByte // SOF0
    out(4) = 0; out(5) = 11                    // segment length (incl. itself)
    out(6) = precision.toByte
    out(7) = ((height >> 8) & 0xff).toByte; out(8) = (height & 0xff).toByte
    out(9) = ((width >> 8) & 0xff).toByte; out(10) = (width & 0xff).toByte
    out(11) = 1                                // 1 component
    out(12) = 1; out(13) = 0x11; out(14) = 0   // id, 1x1 sampling, quant 0
    filler.copyToArray(out, 15)
    out
  }

  /** 4-byte MPEG-1 Layer III frame header (no CRC) + filler: sync, version
    * 3 / layer 1, the bitrate and sample-rate table indices, and channel
    * mode (3 = mono). [[parseMp3]] reads bitrate/rate/channels back and
    * derives the CBR duration from the total length.
    */
  def buildMp3(bitrateKbps: Int, sampleRate: Int, channels: Int,
      filler: Array[Byte]): Array[Byte] = {
    val bi = mp3Bitrates.indexOf(bitrateKbps)
    val ri = mp3Rates.indexOf(sampleRate)
    require(bi > 0 && ri >= 0 && ri < 3, s"not a table entry: $bitrateKbps kbps / $sampleRate Hz")
    val out = new Array[Byte](4 + filler.length)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // sync + MPEG-1 (3) + Layer III (1) + no CRC
    out(2) = ((bi << 4) | (ri << 2)).toByte
    out(3) = (if (channels == 1) 0xc0 else 0x00).toByte // mode: mono | stereo
    filler.copyToArray(out, 4)
    out
  }

  /** Canonical 44-byte RIFF/WAVE header (PCM fmt chunk) with the filler as
    * the data chunk.
    */
  def buildWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      filler: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val out = new Array[Byte](44 + filler.length)
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLe32(4, 36L + filler.length)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLe32(16, 16L) // PCM fmt chunk size
    putLe16(20, 1)   // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate.toLong)
    putLe32(28, byteRate.toLong)
    putLe16(32, blockAlign)
    putLe16(34, bitsPerSample)
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLe32(40, filler.length.toLong)
    filler.copyToArray(out, 44)
    out
  }

  /** Deterministic media corpus over the documents table: each doc becomes
    * a REAL container blob (doc_id mod 5 → png | gif | wav | jpeg | mp3)
    * whose header fields derive arithmetically from doc_id and whose body
    * is the document's UTF-8 bytes — so an oracle can recompute every
    * parsed field without a decoder, while the Spark side round-trips
    * actual bytes through the binary column and [[decodeMeta]].
    */
  def syntheticMediaFrame(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text")(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col(idCol).cast(LongType).as("doc_id"),
        encode(col(textCol), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, body) =>
        val filler = if (body == null) Array.emptyByteArray else body
        // floorMod: Scala % preserves sign, so a negative doc_id would
        // index Array(...)(-1) (task crash) or build negative-width
        // headers; the oracle arithmetic only ever sees the table's
        // non-negative ids, so parity is unaffected
        def m(x: Long, n: Int): Int = java.lang.Math.floorMod(x, n.toLong).toInt
        val w = 1 + m(id, 512)
        val h = 1 + m(id / 7, 512)
        val ch = 1 + m(id, 2)
        m(id, 5) match {
          case 0 => MediaRecord(id, "image/png", buildPng(w, h, 8, filler))
          case 1 => MediaRecord(id, "image/gif", buildGif(w, h, filler))
          case 2 =>
            val rate = 8000 * (1 + m(id / 3, 3))
            MediaRecord(id, "audio/wav", buildWav(rate, ch, 16, filler))
          case 3 => MediaRecord(id, "image/jpeg", buildJpeg(w, h, 8, filler))
          case _ =>
            val kbps = Array(128, 192, 320)(m(id / 5, 3))
            val rate = Array(44100, 48000, 32000)(m(id / 7, 3))
            MediaRecord(id, "audio/mpeg", buildMp3(kbps, rate, ch, filler))
        }
      })
  }
}
