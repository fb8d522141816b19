package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media frame schema: opaque binary payload + typed metadata") {
    val media = Multimodal.toMediaFrame(graft.Tables.load(spark, sf, "documents"))
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "mime", "payload"))
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  // Independent fixture: the well-known 1x1 transparent PNG (public bytes,
  // NOT produced by our own builder) — catches a builder+parser pair that
  // agree with each other but not with the actual format.
  private val onePixelPng = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")

  test("parsePng: real 1x1 PNG fixture parses to exact dimensions") {
    assert(Multimodal.parsePng(onePixelPng) == Some((1L, 1L, 8L)))
    // truncated/garbage inputs parse to None, never throw
    assert(Multimodal.parsePng(onePixelPng.take(10)) == None)
    assert(Multimodal.parsePng("not a png at all".getBytes) == None)
  }

  test("parseGif: hand-written 2x3 GIF89a descriptor (packed=0 -> colorRes 1)") {
    val gif = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      2, 0, 3, 0, // width=2 LE, height=3 LE
      0, 0, 0)    // packed=0, bg, aspect
    assert(Multimodal.parseGif(gif) == Some((2L, 3L, 1L)))
    assert(Multimodal.parseGif(gif.take(12)) == None)
  }

  test("parseWav: canonical 44-byte header, 44.1kHz stereo 16-bit, 500ms") {
    // 88200 data bytes at byteRate 44100*2*2=176400 -> exactly 500 ms
    val wav = Multimodal.buildWav(44100, 2, 16, new Array[Byte](88200))
    assert(Multimodal.parseWav(wav) == Some((2L, 44100L, 500L)))
    // independent field-level checks against the RIFF spec layout
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert((wav(22) & 0xff) == 2)                     // channels LE16 @22
    assert(((wav(24) & 0xff) | ((wav(25) & 0xff) << 8) | ((wav(26) & 0xff) << 16)) == 44100)
    assert(Multimodal.parseWav(wav.take(20)) == None)
  }

  test("parseWav: crafted/corrupt chunk sizes neither hang nor throw") {
    def wavWithChunkSize(size: Long): Array[Byte] = {
      val b = new Array[Byte](24)
      "RIFF".getBytes.copyToArray(b, 0)
      "WAVE".getBytes.copyToArray(b, 8)
      "junk".getBytes.copyToArray(b, 12)
      (0 until 4).foreach(j => b(16 + j) = ((size >> (8 * j)) & 0xff).toByte)
      b
    }
    // 0xFFFFFFF8 reads as -8 in Int space: a naive walk would add 0 and
    // spin forever; 0x7FFFFFF0 would overflow the index negative and throw
    assert(Multimodal.parseWav(wavWithChunkSize(0xFFFFFFF8L)) == None)
    assert(Multimodal.parseWav(wavWithChunkSize(0x7FFFFFF0L)) == None)
    assert(Multimodal.parseWav(wavWithChunkSize(0L)) == None) // zero-size chunk still advances
    // a WAV truncated in storage keeps its parsed header metadata — the
    // declared data size still yields the declared duration
    val truncated = Multimodal.buildWav(44100, 2, 16, new Array[Byte](88200)).take(50)
    assert(Multimodal.parseWav(truncated) == Some((2L, 44100L, 500L)))
    // and the batch contract holds end-to-end
    val meta = Multimodal.decodeMeta(Multimodal.MediaRecord(9L, "audio/wav",
      wavWithChunkSize(0xFFFFFFF8L)))
    assert(meta.media_kind == "unknown")
  }

  test("builders round-trip through decodeMeta with exact values") {
    val body = "hello media".getBytes("UTF-8")
    val png = Multimodal.decodeMeta(Multimodal.MediaRecord(1L, "image/png",
      Multimodal.buildPng(640, 480, 8, body)))
    assert(png == Multimodal.MediaMeta(1L, "png", 33L + body.length, 640L, 480L, 8L, 0, 0, 0))
    val gif = Multimodal.decodeMeta(Multimodal.MediaRecord(2L, "image/gif",
      Multimodal.buildGif(320, 200, body)))
    assert(gif == Multimodal.MediaMeta(2L, "gif", 13L + body.length, 320L, 200L, 8L, 0, 0, 0))
    val wav = Multimodal.decodeMeta(Multimodal.MediaRecord(3L, "audio/wav",
      Multimodal.buildWav(16000, 1, 16, new Array[Byte](8000))))
    // 8000 bytes at 32000 B/s = 250 ms
    assert(wav == Multimodal.MediaMeta(3L, "wav", 44L + 8000L, 0, 0, 0, 1L, 16000L, 250L))
    // PNG builder writes a spec-correct IHDR CRC (a real decoder would check)
    val blob = Multimodal.buildPng(640, 480, 8, body)
    val crc = new java.util.zip.CRC32()
    crc.update(blob, 12, 17)
    val stored = ((blob(29) & 0xffL) << 24) | ((blob(30) & 0xffL) << 16) |
      ((blob(31) & 0xffL) << 8) | (blob(32) & 0xffL)
    assert(stored == crc.getValue)
  }

  test("decodeFeatures: partition-local batch decode over the binary column") {
    implicit val s = spark
    val media = Multimodal.syntheticMediaFrame(graft.Tables.load(spark, sf, "documents"))
    val feats = Multimodal.decodeFeatures(media)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    // every doc decodes to the kind its id dictates — no unknowns
    rows.foreach { m =>
      val expected = (m.doc_id % 3) match {
        case 0 => "png"; case 1 => "gif"; case _ => "wav"
      }
      assert(m.media_kind == expected, s"doc ${m.doc_id}: $m")
    }
    // exact values for one doc of each kind (the arithmetic of
    // syntheticMediaFrame, read back out of the real bytes)
    val byId = rows.map(m => m.doc_id -> m).toMap
    assert(byId(0L).width == 1L && byId(0L).height == 1L && byId(0L).bit_depth == 8L)
    assert(byId(1L).width == 2L && byId(1L).height == 1L)
    assert(byId(2L).channels == 1L && byId(2L).sample_rate == 8000L)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect().map(m => m.doc_id -> m).toMap
    assert(again == byId)
  }

  test("malformed payloads degrade to kind=unknown, never fail the batch") {
    val bad = Multimodal.decodeMeta(Multimodal.MediaRecord(9L, "x", Array[Byte](1, 2, 3)))
    assert(bad == Multimodal.MediaMeta(9L, "unknown", 3L, 0, 0, 0, 0, 0, 0))
    val nul = Multimodal.decodeMeta(Multimodal.MediaRecord(10L, "x", null))
    assert(nul.media_kind == "unknown" && nul.byte_len == 0L)
  }
}
