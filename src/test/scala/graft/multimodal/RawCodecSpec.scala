package graft.multimodal

import graft.SparkSpec

/** Real-codec kernels over synthesized genuine BMP/WAV payloads: probe,
  * pixel/sample extraction, resize, features, frames, and the Codec
  * dispatch (real formats → RawCodec, anything else → StubCodec),
  * end-to-end through the Spark operators.
  */
class RawCodecSpec extends SparkSpec {
  import spark.implicits._

  // 4x3 top-down gradient: pixel (x,y) = RGB(x*40, y*40, 10)
  private def bmp4x3: Array[Byte] = {
    val px = Array.tabulate(3 * 4) { i =>
      val (x, y) = (i % 4, i / 4)
      ((x * 40) << 16) | ((y * 40) << 8) | 10
    }
    RawCodec.writeBmp(4, 3, px)
  }

  // 8 kHz mono PCM16 WAV, 16 samples: ramp 0, 1000, 2000, ...
  private def wav16: Array[Byte] = {
    val samples = Array.tabulate[Short](16)(i => (i * 1000).toShort)
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** MP3 payload: optional ID3v2 tag, one MPEG frame header, audio
    * bytes. Header fields per the public layout (sync/version/layer,
    * bitrate idx in bits 15-12, samplerate idx in 11-10). */
  private def mp3(b1: Int, b2: Int, audioBytes: Int,
                  id3PayloadLen: Int = 0): Array[Byte] = {
    val tag =
      if (id3PayloadLen > 0)
        Array[Byte]('I', 'D', '3', 4, 0, 0,
          ((id3PayloadLen >> 21) & 0x7f).toByte, ((id3PayloadLen >> 14) & 0x7f).toByte,
          ((id3PayloadLen >> 7) & 0x7f).toByte, (id3PayloadLen & 0x7f).toByte) ++
          new Array[Byte](id3PayloadLen)
      else Array.empty[Byte]
    tag ++ Array(0xff.toByte, b1.toByte, b2.toByte, 0.toByte) ++
      new Array[Byte](audioBytes - 4)
  }

  test("MP3 probe: MPEG1 Layer III header yields the CBR duration estimate") {
    // 0xFB = sync|MPEG1|LayerIII|no-CRC; 0x90 = bitrate idx 9 (128 kbps
    // in the MPEG1-L3 table), samplerate idx 0 (44100)
    val c = mp3(0xfb, 0x90, audioBytes = 16000)
    assert(RawCodec.sniff(c).contains("mp3"))
    // 16000 bytes * 8 / 128 kbps = 1000 ms
    assert(RawCodec.probeMp3(c) == MediaMeta("mp3", 0, 0, 1000L))
    assert(MediaOps.Codec.probe(c) == MediaMeta("mp3", 0, 0, 1000L))
  }

  test("MP3 probe: ID3v2 tag is skipped via its syncsafe size") {
    // 200-byte tag payload, then an MPEG2 Layer III frame: 0xF3 =
    // sync|MPEG2|LayerIII; 0x80 = bitrate idx 8 (64 kbps in the
    // MPEG2-L23 table), samplerate idx 0 (22050)
    val c = mp3(0xf3, 0x80, audioBytes = 8000, id3PayloadLen = 200)
    assert(RawCodec.sniff(c).contains("mp3"))
    // duration counts from the frame sync, not the tag: 8000*8/64 = 1000
    assert(RawCodec.probeMp3(c) == MediaMeta("mp3", 0, 0, 1000L))
  }

  test("MP3 probe: corrupt headers fall back to the stub via the dispatcher") {
    // bitrate index 15 ("bad") and reserved version id both throw
    intercept[IllegalArgumentException](RawCodec.probeMp3(mp3(0xfb, 0xf0, 100)))
    intercept[IllegalArgumentException](RawCodec.probeMp3(mp3(0xeb, 0x90, 100)))
    val corrupt = mp3(0xfb, 0xf0, 100)
    assert(MediaOps.Codec.probe(corrupt) == MediaOps.StubCodec.probe(corrupt))
    // an ID3 tag with NO frame sync after it also falls back
    val tagOnly = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    assert(MediaOps.Codec.probe(tagOnly) == MediaOps.StubCodec.probe(tagOnly))
  }

  test("MP3 probe: a confirmed two-frame stream wins at the first frame") {
    // frame length for MPEG1-L3 128 kbps @44100 = 417 bytes: place a
    // second valid header exactly there — the candidate CONFIRMS
    val h = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte)
    val c = h ++ new Array[Byte](417 - 4) ++ h ++ new Array[Byte](417 - 4)
    assert(RawCodec.probeMp3(c) == MediaMeta("mp3", 0, 0, 834L * 8 / 128))
  }

  test("MP3 probe: multiple unconfirmed junk candidates throw to the stub") {
    // two sync-shaped field-valid pairs at a spacing that matches no
    // frame length, inside a payload longer than one frame — the
    // random-junk signature must NOT yield a bogus duration
    val h = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte)
    val c = new Array[Byte](1000)
    h.copyToArray(c, 0); h.copyToArray(c, 100)
    intercept[IllegalArgumentException](RawCodec.probeMp3(c))
    assert(MediaOps.Codec.probe(c) == MediaOps.StubCodec.probe(c))
  }

  test("MP3 probe: a false sync before the real first frame is skipped, not fatal") {
    // junk containing a sync-shaped byte pair with an INVALID header
    // (bitrate idx 0) precedes a valid MPEG1-L3 frame — a parser that
    // aborts on the first candidate would stub this playable file
    val junk = Array(0xff.toByte, 0xf0.toByte, 0x00.toByte, 0x00.toByte)
    val valid = mp3(0xfb, 0x90, audioBytes = 16000)
    val c = junk ++ valid
    // duration counts from the VALID frame: 16000 * 8 / 128 = 1000 ms
    assert(RawCodec.probeMp3(c) == MediaMeta("mp3", 0, 0, 1000L))
  }

  test("crafted BMP width that overflows Int*3 is rejected, not allocated") {
    // w = 715,827,883: w*3 overflows Int to a NEGATIVE rowSize, which
    // (before the Long-arithmetic guard) made the payload-bound check
    // pass for this 54-byte header and sent execution into a ~2.8 GB
    // Array[Int] allocation whose OutOfMemoryError escapes Codec.total.
    val c = new Array[Byte](54)
    def put32(o: Int, v: Int): Unit = {
      c(o) = v.toByte; c(o + 1) = (v >> 8).toByte
      c(o + 2) = (v >> 16).toByte; c(o + 3) = (v >> 24).toByte
    }
    c(0) = 'B'; c(1) = 'M'
    put32(10, 54); put32(18, 715827883); put32(22, 1)
    c(28) = 24 // bpp (low byte of the u16)
    intercept[IllegalArgumentException](RawCodec.bmpPixels(c))
    // through the dispatcher: stub fallback, never an Error
    val f = MediaOps.Codec.feature(c, 8)
    assert(f.length == 8)
    assert(f.sameElements(MediaOps.StubCodec.feature(c, 8)))
  }

  test("BMP round-trip: write, sniff, probe, pixels") {
    val b = bmp4x3
    assert(RawCodec.sniff(b).contains("bmp"))
    assert(RawCodec.probeBmp(b) == MediaMeta("bmp", 4, 3, 0L))
    val (w, h, px) = RawCodec.bmpPixels(b)
    assert((w, h) == (4, 3))
    assert(px(0) == 0x00000a)           // (0,0): r=0 g=0 b=10
    assert(px(1 * 4 + 2) == 0x50280a)   // (2,1): r=80 g=40 b=10
  }

  test("BMP nearest-neighbor resize picks the expected source pixels") {
    val small = RawCodec.resizeBmp(bmp4x3, 2, 2)
    val (w, h, px) = RawCodec.bmpPixels(small)
    assert((w, h) == (2, 2))
    // x: 0->0, 1->2 ; y: 0->0, 1->1 (floor scaling)
    assert(px(0) == 0x00000a)       // src (0,0)
    assert(px(1) == 0x50000a)       // src (2,0)
    assert(px(2) == 0x00280a)       // src (0,1)
    assert(px(3) == 0x50280a)       // src (2,1)
  }

  test("BMP feature pools mean gray per bucket") {
    val f = RawCodec.bmpFeature(bmp4x3, 3)
    assert(f.length == 3)
    // gray of row y, col x = (40x + 40y + 10)/3; bucket 0 = row 0
    val row0 = (0 until 4).map(x => (40 * x + 0 + 10) / 3.0 / 255.0).sum / 4
    assert(math.abs(f(0) - (row0 * 2 - 1)) < 1e-6)
  }

  test("WAV probe computes duration from fmt+data chunks") {
    val m = RawCodec.probeWav(wav16)
    assert(m.format == "wav")
    assert(m.durationMs == 16 * 1000L / 8000) // 16 samples at 8kHz = 2ms
    assert(RawCodec.wavSamples(wav16).toSeq == (0 until 16).map(i => (i * 1000).toShort))
  }

  test("WAV frames are sample-aligned PCM chunks; feature pools |amplitude|") {
    val fr = RawCodec.wavFrames(wav16, 4)
    assert(fr.length == 4 && fr.forall(_.length == 8)) // 4 samples * 2 bytes
    // frame 1 holds samples 4..7
    val b = java.nio.ByteBuffer.wrap(fr(1)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((0 until 4).map(_ => b.getShort()) == Seq(4000, 5000, 6000, 7000))
    val f = RawCodec.wavFeature(wav16, 2)
    val expect0 = (0 until 8).map(i => i * 1000.0 / 32768.0).sum / 8 * 2 - 1
    assert(math.abs(f(0) - expect0) < 1e-6)
  }

  test("malformed or unsupported real-format payloads fall back to stubs, never throw") {
    // sniffs as BMP but is 32-bpp / truncated / lying headers
    val bmp32 = { val b = bmp4x3.clone(); b(28) = 32; b }
    val truncated = bmp4x3.take(60)
    val lyingWidth = { val b = bmp4x3.clone(); b(18) = 127; b(19) = 127; b }
    // sniffs as WAV but chunk size is -8 (would loop forever unguarded)
    val evilWav = { val b = wav16.clone(); b(16) = -8; b(17) = -1; b(18) = -1; b(19) = -1; b }
    val noData = wav16.take(36)
    for (p <- Seq(bmp32, truncated, lyingWidth, evilWav, noData)) {
      MediaOps.Codec.probe(p)
      MediaOps.Codec.resize(p, 2, 2)
      MediaOps.Codec.feature(p, 4)
      MediaOps.Codec.frames(p, 3)
    }
  }

  test("wav frames absorb the tail and never emit empty frames") {
    val fr5 = RawCodec.wavFrames(wav16, 5) // 16 samples / 5 → 3,3,3,3,4
    assert(fr5.map(_.length / 2) == Seq(3, 3, 3, 3, 4))
    val tiny = {
      val samples = Array[Short](7, 9)
      val out = java.nio.ByteBuffer.allocate(48)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(40)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(4)
      samples.foreach(out.putShort)
      out.array()
    }
    val fr4 = RawCodec.wavFrames(tiny, 4)
    assert(fr4.length == 2 && fr4.forall(_.nonEmpty))
  }

  test("Codec dispatch: real formats use RawCodec, others fall back to stub") {
    assert(MediaOps.Codec.probe(bmp4x3).format == "bmp")
    assert(MediaOps.Codec.probe(wav16).format == "wav")
    val fake = "not-a-container".getBytes
    assert(Seq("png", "jpeg").contains(MediaOps.Codec.probe(fake).format))
  }

  test("end-to-end through the Spark operators with mixed real/stub payloads") {
    val raw = Seq(
      (1L, "image", bmp4x3),
      (2L, "audio", wav16),
      (3L, "blob", "opaque-payload".getBytes)).toDS()
    val decoded = MediaOps.decode(raw)
    val metas = decoded.collect().map(m => m.mediaId -> m.meta).toMap
    assert(metas(1L) == MediaMeta("bmp", 4, 3, 0L))
    assert(metas(2L).format == "wav" && metas(2L).durationMs == 2L)

    val resized = MediaOps.resize(decoded, 2, 2).collect()
      .map(m => m.mediaId -> m).toMap
    val (w, h, _) = RawCodec.bmpPixels(resized(1L).content)
    assert((w, h) == (2, 2)) // the resized image IS a decodable BMP

    val feats = MediaOps.extractFeatures(decoded, dim = 4).collect()
    assert(feats.forall(_.feature.length == 4))

    val frames = MediaOps.sampleFrames(decoded, 4).collect()
    assert(frames.count(_.mediaId == 2L) == 4)
  }

  test("writeWav round-trips through sniff/probe/samples and matches the manual fixture") {
    val samples = Array.tabulate[Short](16)(i => (i * 1000).toShort)
    val written = RawCodec.writeWav(8000, samples)
    // byte-identical to the independently built ByteBuffer fixture
    assert(written.toSeq == wav16.toSeq)
    assert(RawCodec.sniff(written).contains("wav"))
    assert(RawCodec.wavSamples(written).toSeq == samples.toSeq)
    // 16 samples at 8 kHz mono PCM16 = 32 bytes / 16000 Bps = 2 ms
    assert(RawCodec.probeWav(written) == MediaMeta("wav", 0, 0, 2L))
    // negative amplitudes survive the little-endian round trip
    val neg = Array[Short](-32768, -1, 0, 1, 32767)
    assert(RawCodec.wavSamples(RawCodec.writeWav(44100, neg)).toSeq == neg.toSeq)
  }
}
