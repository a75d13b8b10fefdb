package graft.multimodal

/** REAL codec kernels for the container formats that need no external
  * library — plain byte-layout parsing of BMP (uncompressed 24-bpp) and
  * WAV (PCM16). Compressed IMAGE formats (png/jpeg/gif/tiff) run
  * through the JDK's `javax.imageio` kernels in [[ImageIoCodec]];
  * compressed audio (mp3, …) falls back to [[MediaOps.StubCodec]]
  * because the JDK ships no audio codec.
  *
  * Format references are the public file-format layouts: BMP =
  * BITMAPFILEHEADER (14 B: 'BM', size, pixel-array offset at 10) +
  * BITMAPINFOHEADER (width @18, height @22 — positive ⇒ bottom-up rows,
  * bpp @28), rows padded to 4-byte boundaries; WAV = RIFF/WAVE chunk
  * stream with an `fmt ` chunk (channels/rate/bits) and a `data` chunk
  * of PCM samples.
  */
object RawCodec {

  /** Which real codec, if any, can handle this payload. MP3 is matched
    * by an ID3v2 tag or a raw MPEG frame sync (0xFFEx — disjoint from
    * JPEG's 0xFFD8, which [[ImageIoCodec.sniff]] owns); only the
    * header PROBE is real for mp3 ([[probeMp3]]) — full decode needs a
    * codec library the JDK doesn't ship, so feature/frames fall back to
    * the stub. */
  def sniff(content: Array[Byte]): Option[String] =
    if (content.length >= 54 && content(0) == 'B' && content(1) == 'M') Some("bmp")
    else if (content.length >= 44 && ascii(content, 0, 4) == "RIFF" &&
      ascii(content, 8, 4) == "WAVE") Some("wav")
    else if (content.length >= 10 && content(0) == 'I' && content(1) == 'D' &&
      content(2) == '3') Some("mp3")
    else if (content.length >= 4 && (content(0) & 0xff) == 0xff &&
      (content(1) & 0xe0) == 0xe0) Some("mp3")
    else None

  private def ascii(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, "US-ASCII")
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  // ------------------------------------------------------------- BMP

  def probeBmp(c: Array[Byte]): MediaMeta =
    MediaMeta("bmp", i32(c, 18), math.abs(i32(c, 22)), 0L)

  /** 24-bpp pixel grid as 0xRRGGBB ints, row-major top-down. */
  def bmpPixels(c: Array[Byte]): (Int, Int, Array[Int]) = {
    val off = i32(c, 10)
    val w = i32(c, 18)
    val hRaw = i32(c, 22)
    val h = math.abs(hRaw)
    require(u16(c, 28) == 24, s"only 24-bpp BMP supported, got ${u16(c, 28)}")
    // Validate the claimed geometry against the actual payload BEFORE
    // allocating w*h ints: a corrupt/crafted header claiming huge
    // dimensions would otherwise raise OutOfMemoryError — an Error, not
    // NonFatal, so it would ESCAPE Codec.total's stub fallback and kill
    // the task. ALL arithmetic in Long: w ≥ 715,827,883 overflows w*3 in
    // Int to a negative rowSize, which would make the payload bound pass
    // for a 54-byte crafted header; and w*h must itself fit an Int
    // before `new Array[Int](w * h)` is legal.
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    require(w > 0 && h > 0 && off >= 54 &&
      w.toLong * h <= Int.MaxValue &&
      off.toLong + rowSizeL * h <= c.length,
      s"BMP header claims ${w}x$h at offset $off but payload is ${c.length} B")
    val rowSize = rowSizeL.toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      // positive height ⇒ rows stored bottom-up
      val srcRow = if (hRaw > 0) h - 1 - y else y
      val base = off + srcRow * rowSize
      var x = 0
      while (x < w) {
        val o = base + x * 3
        px(y * w + x) = ((c(o + 2) & 0xff) << 16) | ((c(o + 1) & 0xff) << 8) | (c(o) & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Standard 54-byte-header 24-bpp BMP from a top-down pixel grid. */
  def writeBmp(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, size); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h) // positive ⇒ bottom-up
    put16(26, 1); put16(28, 24)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val o = base + x * 3
        out(o) = p.toByte; out(o + 1) = (p >> 8).toByte; out(o + 2) = (p >> 16).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize, returning a real BMP. */
  def resizeBmp(c: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val (w, h, px) = bmpPixels(c)
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = math.min(h - 1, y * h / h2)
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = px(sy * w + math.min(w - 1, x * w / w2))
        x += 1
      }
      y += 1
    }
    writeBmp(w2, h2, out)
  }

  /** Mean-gray feature: pixels in reading order split into `dim`
    * buckets, bucket mean gray mapped to [-1, 1]. */
  def bmpFeature(c: Array[Byte], dim: Int): Array[Float] = {
    val (_, _, px) = bmpPixels(c)
    bucketMeans(px.length, dim) { i =>
      val p = px(i)
      ((((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0) / 255.0
    }
  }

  // ------------------------------------------------------------- WAV

  /** Standard 44-byte-header mono PCM16 WAV — the audio counterpart of
    * [[writeBmp]] (fixture synthesis and the write side of transcode). */
  def writeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, o)
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16)
    put16(20, 1); put16(22, 1) // PCM, mono
    put32(24, rate); put32(28, rate * 2) // byte rate = rate · 1ch · 2B
    put16(32, 2); put16(34, 16) // block align, bits
    tag(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = samples(i).toByte
      out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  private case class WavInfo(channels: Int, rate: Int, bits: Int,
                             dataOff: Int, dataLen: Int)

  private def wavInfo(c: Array[Byte]): WavInfo = {
    var channels = 1; var rate = 1; var bits = 16
    var dataOff = -1; var dataLen = 0
    var o = 12
    var ok = true
    while (ok && o + 8 <= c.length) {
      val id = ascii(c, o, 4)
      val sz = i32(c, o + 4)
      // corrupt size fields (negative, or placing fmt fields out of
      // bounds) abort the walk instead of spinning/crashing
      if (sz < 0) ok = false
      else {
        if (id == "fmt " && o + 24 <= c.length) {
          channels = u16(c, o + 10); rate = i32(c, o + 12); bits = u16(c, o + 22)
        } else if (id == "data") {
          dataOff = o + 8; dataLen = math.min(sz, c.length - dataOff)
        }
        o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    require(dataOff >= 0, "WAV without data chunk")
    WavInfo(channels, rate, bits, dataOff, dataLen)
  }

  def probeWav(c: Array[Byte]): MediaMeta = {
    val w = wavInfo(c)
    val bytesPerSec = w.rate.toLong * w.channels * (w.bits / 8)
    MediaMeta("wav", 0, 0,
      if (bytesPerSec == 0) 0L else w.dataLen * 1000L / bytesPerSec)
  }

  /** Interleaved PCM16 samples from the data chunk. */
  def wavSamples(c: Array[Byte]): Array[Short] = {
    val w = wavInfo(c)
    require(w.bits == 16, s"only PCM16 supported, got ${w.bits}")
    val n = w.dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = u16(c, w.dataOff + 2 * i).toShort; i += 1 }
    out
  }

  /** Mean-|amplitude| feature over `dim` time buckets, in [0, 1]-ish
    * scale mapped to [-1, 1] like the image feature. */
  def wavFeature(c: Array[Byte], dim: Int): Array[Float] = {
    val s = wavSamples(c)
    bucketMeans(s.length, dim)(i => math.abs(s(i).toDouble) / 32768.0)
  }

  /** n sample-aligned PCM16 chunks (raw sample bytes): the last frame
    * absorbs any remainder, and frames past the sample count are
    * suppressed rather than emitted empty. */
  def wavFrames(c: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val s = wavSamples(c)
    val frames = math.max(1, math.min(n, s.length))
    val per = s.length / frames
    (0 until frames).map { i =>
      val from = i * per
      val until = if (i == frames - 1) s.length else from + per
      val bytes = new Array[Byte]((until - from) * 2)
      var j = from
      while (j < until) {
        bytes(2 * (j - from)) = s(j).toByte
        bytes(2 * (j - from) + 1) = (s(j) >> 8).toByte
        j += 1
      }
      bytes
    }
  }

  // ------------------------------------------------------------- MP3

  /** Bitrate tables in kbps, indexed 1–14 (0 = free, 15 = bad): public
    * MPEG audio frame-header layout. Rows: MPEG1 Layer I/II/III, then
    * MPEG2/2.5 Layer I and Layer II+III (which share a table). */
  private val Mp3BitrateKbps: Map[(Int, Int), Array[Int]] = {
    val v1l1 = Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    val v1l2 = Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    val v1l3 = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val v2l1 = Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    val v2l23 = Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    // version id: 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1; layer id: 1 = III,
    // 2 = II, 3 = I (both straight from the header bit fields)
    Map((3, 3) -> v1l1, (3, 2) -> v1l2, (3, 1) -> v1l3,
        (2, 3) -> v2l1, (2, 2) -> v2l23, (2, 1) -> v2l23,
        (0, 3) -> v2l1, (0, 2) -> v2l23, (0, 1) -> v2l23)
  }

  /** Sample rates in Hz by (version id, samplerate index 0–2). */
  private val Mp3SampleRate: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** Metadata from the first MPEG audio frame header — a real probe for
    * the last common format whose full decode legitimately needs an
    * external codec. Layout (public): optional ID3v2 tag (10-byte header
    * + syncsafe 28-bit size), then frames of 11-bit sync + version id +
    * layer id + bitrate/samplerate indices. Duration is the standard
    * CBR estimate `audioBytes * 8 / bitrate`; invalid headers (reserved
    * version/layer, bitrate index 0/15, samplerate index 3) throw, so
    * the dispatcher falls back to the stub for corrupt payloads. */
  def probeMp3(c: Array[Byte]): MediaMeta = {
    val afterTag =
      if (c.length >= 10 && c(0) == 'I' && c(1) == 'D' && c(2) == '3')
        10 + (((c(6) & 0x7f) << 21) | ((c(7) & 0x7f) << 14) |
              ((c(8) & 0x7f) << 7) | (c(9) & 0x7f))
      else 0
    // Header fields at a sync candidate, with the frame length the
    // header implies (public layout: Layer I frames are
    // (12·bitrate/samplerate + pad)·4 bytes; Layer II/III are
    // coef·bitrate/samplerate + pad with coef 144, except 72 for
    // MPEG2/2.5 Layer III's half-rate granule).
    def header(o: Int): Option[(Int, Int)] = { // (kbps, frameLen)
      if (o + 4 > c.length || (c(o) & 0xff) != 0xff || (c(o + 1) & 0xe0) != 0xe0)
        return None
      val b1 = c(o + 1) & 0xff
      val b2 = c(o + 2) & 0xff
      val version = (b1 >> 3) & 3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
      val layer = (b1 >> 1) & 3   // 0=reserved, 1=III, 2=II, 3=I
      val bitrateIdx = (b2 >> 4) & 0xf
      val srIdx = (b2 >> 2) & 3
      val pad = (b2 >> 1) & 1
      if (version == 1 || layer == 0 || srIdx == 3 ||
          bitrateIdx < 1 || bitrateIdx > 14) return None
      val kbps = Mp3BitrateKbps((version, layer))(bitrateIdx - 1)
      val sr = Mp3SampleRate(version)(srIdx)
      val frameLen =
        if (layer == 3) (12 * kbps * 1000 / sr + pad) * 4
        else {
          val coef = if (layer == 1 && version != 3) 72 else 144
          coef * kbps * 1000 / sr + pad
        }
      Some((kbps, frameLen))
    }
    // encoders may pad between tag and first frame: scan for the sync,
    // resuming past false candidates (junk containing 0xFF). Acceptance
    // is tiered against the two failure modes: (a) abort-on-first-
    // candidate stubbed out playable files with junk before frame 1;
    // (b) accept-any-field-valid-candidate returns a bogus duration for
    // random junk. So: a candidate whose implied frame length lands on
    // a SECOND valid header (or at/after EOF) wins immediately — a real
    // CBR stream confirms at its first frame; otherwise a UNIQUE
    // field-valid candidate is accepted (a lone final frame), while
    // multiple unconfirmed candidates — the random-junk signature —
    // throw to the stub fallback.
    def dur(o: Int, kbps: Int): MediaMeta =
      MediaMeta("mp3", 0, 0, (c.length - o).toLong * 8 / kbps)
    var o = afterTag
    var lone: Option[(Int, Int)] = None // (offset, kbps)
    var nValid = 0
    while (o + 4 <= c.length) {
      header(o) match {
        case Some((kbps, frameLen)) =>
          if (frameLen > 4 &&
              (o + frameLen >= c.length || header(o + frameLen).isDefined))
            return dur(o, kbps)
          nValid += 1
          if (lone.isEmpty) lone = Some((o, kbps))
          o += 1
        case None => o += 1
      }
    }
    lone match {
      case Some((off, kbps)) if nValid == 1 => dur(off, kbps)
      case _ => throw new IllegalArgumentException(
        s"no confirmed MPEG frame header in payload ($nValid unconfirmed candidates)")
    }
  }

  private[multimodal] def bucketMeans(n: Int, dim: Int)(value: Int => Double): Array[Float] = {
    val out = new Array[Float](dim)
    if (n == 0) return out
    var b = 0
    while (b < dim) {
      // Long arithmetic: b*n overflows Int for >2^31/dim samples/pixels
      val from = (b.toLong * n / dim).toInt
      val until = math.max(from + 1, ((b + 1).toLong * n / dim).toInt)
      var s = 0.0
      var i = from
      while (i < math.min(until, n)) { s += value(i); i += 1 }
      val cnt = math.max(1, math.min(until, n) - from)
      out(b) = (s / cnt * 2.0 - 1.0).toFloat
      b += 1
    }
    out
  }
}
