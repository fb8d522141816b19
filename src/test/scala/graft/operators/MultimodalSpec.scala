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

  test("parseJpeg: hand-written marker walk (APP0 skipped, SOF2 found)") {
    // independent of buildJpeg: SOI, a 2-payload-byte APP0 to skip, then a
    // progressive SOF2 declaring height 256 x width 512, precision 8
    val jpeg = Array[Int](
      0xff, 0xd8,             // SOI
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4 (2 payload bytes)
      0xff, 0xc2, 0x00, 0x0b, // SOF2, len 11
      0x08,                   // precision
      0x01, 0x00,             // height 256 BE
      0x02, 0x00,             // width 512 BE
      0x01, 0x01, 0x11, 0x00  // 1 component
    ).map(_.toByte)
    assert(Multimodal.parseJpeg(jpeg) == Some((512L, 256L, 8L)))
    assert(Multimodal.parseJpeg(jpeg.take(9)) == None)
    assert(Multimodal.parseJpeg("notajpeg".getBytes) == None)
    // a declared segment length < 2 is malformed: abort, don't loop
    val bad = jpeg.clone(); bad(4) = 0; bad(5) = 0
    assert(Multimodal.parseJpeg(bad) == None)
    // fill-byte run ending at the buffer tail: the marker's length field
    // would sit past the end — must return None, not read out of bounds
    val tailFill = Array(0xff, 0xd8, 0xff, 0xff, 0xe0, 0x41).map(_.toByte)
    assert(Multimodal.parseJpeg(tailFill) == None)
    assert(Multimodal.parseJpeg(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)) == None)
  }

  test("parseMp3: hand-written MPEG-1 Layer III header (128kbps/44.1kHz stereo)") {
    // FF FB: sync+MPEG1+LayerIII; 0x90 = bitrate idx 9 (128) | rate idx 0
    val hdr = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    val frame = hdr ++ new Array[Byte](15996) // 16000 bytes total
    // 16000 bytes at 128 kbps -> exactly 1000 ms; mode 0 = stereo
    assert(Multimodal.parseMp3(frame) == Some((2L, 44100L, 1000L)))
    // mono mode bits
    val mono = frame.clone(); mono(3) = 0xc0.toByte
    assert(Multimodal.parseMp3(mono).map(_._1) == Some(1L))
    // MPEG-2 (version bits), bad bitrate index 15, bad rate index 3: None
    val v2 = frame.clone(); v2(1) = 0xf3.toByte
    assert(Multimodal.parseMp3(v2) == None)
    val badBr = frame.clone(); badBr(2) = 0xf0.toByte
    assert(Multimodal.parseMp3(badBr) == None)
    val badRate = frame.clone(); badRate(2) = 0x9c.toByte
    assert(Multimodal.parseMp3(badRate) == None)
    assert(Multimodal.parseMp3(frame.take(3)) == None)
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
    val jpg = Multimodal.decodeMeta(Multimodal.MediaRecord(4L, "image/jpeg",
      Multimodal.buildJpeg(1024, 768, 8, body)))
    assert(jpg == Multimodal.MediaMeta(4L, "jpeg", 15L + body.length, 1024L, 768L, 8L, 0, 0, 0))
    val mp3 = Multimodal.decodeMeta(Multimodal.MediaRecord(5L, "audio/mpeg",
      Multimodal.buildMp3(320, 48000, 2, new Array[Byte](39996))))
    // 40000 bytes at 320 kbps = 1000 ms exactly
    assert(mp3 == Multimodal.MediaMeta(5L, "mp3", 40000L, 0, 0, 0, 2L, 48000L, 1000L))
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
      val expected = (m.doc_id % 5) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "wav"; case 3 => "jpeg"; case _ => "mp3"
      }
      assert(m.media_kind == expected, s"doc ${m.doc_id}: $m")
    }
    // exact values for one doc of each kind (the arithmetic of
    // syntheticMediaFrame, read back out of the real bytes)
    val byId = rows.map(m => m.doc_id -> m).toMap
    assert(byId(0L).width == 1L && byId(0L).height == 1L && byId(0L).bit_depth == 8L)
    assert(byId(1L).width == 2L && byId(1L).height == 1L)
    assert(byId(2L).channels == 1L && byId(2L).sample_rate == 8000L)
    assert(byId(3L).width == 4L && byId(3L).height == 1L && byId(3L).bit_depth == 8L)
    // doc 4: mp3, ch = 1 + 4%2 = 1, kbps idx (4/5)%3 = 0 -> 128,
    // rate idx (4/7)%3 = 0 -> 44100
    assert(byId(4L).channels == 1L && byId(4L).sample_rate == 44100L)
    assert(byId(4L).duration_ms == byId(4L).byte_len * 8000L / 128000L)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect().map(m => m.doc_id -> m).toMap
    assert(again == byId)
  }

  test("property: random/truncated/bit-flipped payloads never throw and never loop") {
    // the WAV 0xFFFFFFF8 infinite loop (round 10) and the JPEG len<2
    // stall are exactly the class of bug this generator exists to catch:
    // every parser must TERMINATE with Some/None on arbitrary bytes
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val body = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray))
    val wellFormed: Gen[Array[Byte]] = for {
      b <- body
      blob <- Gen.oneOf(
        Multimodal.buildPng(3, 5, 8, b), Multimodal.buildGif(3, 5, b),
        Multimodal.buildWav(16000, 1, 16, b), Multimodal.buildJpeg(3, 5, 8, b),
        Multimodal.buildMp3(128, 44100, 1, b))
    } yield blob
    val mangled: Gen[Array[Byte]] = for {
      blob <- wellFormed
      mode <- Gen.chooseNum(0, 3)
      at <- Gen.chooseNum(0, math.max(0, blob.length - 1))
      bit <- Gen.chooseNum(0, 7)
      keep <- Gen.chooseNum(0, blob.length)
      ffRun <- Gen.chooseNum(1, 6)
    } yield mode match {
      case 0 => blob.take(keep)                                     // truncate
      case 1 => val c = blob.clone(); c(at) = (c(at) ^ (1 << bit)).toByte; c // bit-flip
      case 2 => blob.reverse                                        // garbage
      // FF fill-byte run spliced mid-blob then truncated: the JPEG marker
      // walk's length field can land exactly at the buffer tail
      case _ => (blob.take(at) ++ Array.fill(ffRun)(0xff.toByte)).take(math.max(2, keep))
    }
    val anyBytes = Gen.oneOf(body, wellFormed, mangled)
    val prop = Prop.forAll(anyBytes) { bytes =>
      // a watchdog bounds "never loops": each parse must finish fast
      val t0 = System.nanoTime()
      val meta = Multimodal.decodeMeta(Multimodal.MediaRecord(1L, "x", bytes))
      val micros = (System.nanoTime() - t0) / 1000
      meta.byte_len == bytes.length && micros < 1000000L
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500).withInitialSeed(Seed(511L)), prop)
    assert(res.passed, s"parser fuzz failed: ${res.status}")
  }

  test("malformed payloads degrade to kind=unknown, never fail the batch") {
    val bad = Multimodal.decodeMeta(Multimodal.MediaRecord(9L, "x", Array[Byte](1, 2, 3)))
    assert(bad == Multimodal.MediaMeta(9L, "unknown", 3L, 0, 0, 0, 0, 0, 0))
    val nul = Multimodal.decodeMeta(Multimodal.MediaRecord(10L, "x", null))
    assert(nul.media_kind == "unknown" && nul.byte_len == 0L)
  }
}
