package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

class ImageIoCodecSpec extends AnyFunSuite {

  /** A real encoded image with a deterministic pixel pattern. */
  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 53) % 256 << 8) | ((x + y) % 256))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  /** A syntactically valid PNG signature + IHDR declaring w×h — a
    * decompression bomb's header: tiny payload, huge claimed raster. */
  private def bombPng(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val data = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val typed = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32()
    crc.update(typed)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
    out.write(typed)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    out.toByteArray
  }

  test("decompression bomb: huge declared dimensions never reach full decode") {
    val bomb = bombPng(50000, 50000) // 2.5G pixels from a 33-byte payload
    assert(ImageIoCodec.sniff(bomb) == Some("png"))
    // header-only probe is safe and reports the declared geometry
    assert(ImageIoCodec.probe(bomb, "png") == MediaMeta("png", 50000, 50000, 0L))
    // full-decode paths reject via the pixel cap (IllegalArgument, which
    // IS NonFatal) instead of letting ImageIO allocate the raster and
    // throw OutOfMemoryError (an Error — it would escape Codec.total)
    intercept[IllegalArgumentException](ImageIoCodec.feature(bomb, 8))
    intercept[IllegalArgumentException](ImageIoCodec.resize(bomb, "png", 4, 4))
    // dispatcher contract: one crafted payload falls back to the stub
    assert(MediaOps.Codec.feature(bomb, 8)
      .sameElements(MediaOps.StubCodec.feature(bomb, 8)))
  }

  test("sniff recognizes png/jpeg/gif magic and rejects other payloads") {
    assert(ImageIoCodec.sniff(encoded("png", 4, 4)) == Some("png"))
    assert(ImageIoCodec.sniff(encoded("jpg", 4, 4)) == Some("jpeg"))
    assert(ImageIoCodec.sniff(encoded("gif", 4, 4)) == Some("gif"))
    assert(ImageIoCodec.sniff("not an image at all".getBytes) == None)
    assert(ImageIoCodec.sniff(RawCodec.writeBmp(2, 2, Array(0, 0, 0, 0))) == None,
      "BMP stays owned by RawCodec")
  }

  test("probe reads dimensions from the header for png, jpeg and gif") {
    for ((fmt, name) <- Seq(("png", "png"), ("jpg", "jpeg"), ("gif", "gif"))) {
      val meta = MediaOps.Codec.probe(encoded(fmt, 23, 11))
      assert(meta == MediaMeta(name, 23, 11, 0L), fmt)
    }
  }

  test("png resize is nearest-neighbor re-encoded as png (lossless round-trip)") {
    val src = encoded("png", 8, 6)
    val out = MediaOps.Codec.resize(src, 4, 3)
    assert(ImageIoCodec.sniff(out) == Some("png"), "resize keeps the source format")
    val img = ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 4 && img.getHeight == 6 / 2)
    val srcImg = ImageIO.read(new java.io.ByteArrayInputStream(src))
    for (y <- 0 until 3; x <- 0 until 4)
      // same nearest-neighbor rule as RawCodec.resizeBmp: src (x*w/w2, y*h/h2)
      assert((img.getRGB(x, y) & 0xffffff) == (srcImg.getRGB(x * 8 / 4, y * 6 / 3) & 0xffffff))
  }

  test("jpeg resize yields a decodable jpeg with the requested geometry") {
    val out = MediaOps.Codec.resize(encoded("jpg", 16, 16), 5, 7)
    assert(ImageIoCodec.sniff(out) == Some("jpeg"))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 5 && img.getHeight == 7)
  }

  test("png feature equals the BMP kernel's feature for identical pixels") {
    // same pixel grid through both real kernels must give the same
    // pooled-gray vector (PNG is lossless)
    val w = 9; val h = 5
    val px = Array.tabulate(w * h)(i => ((i * 31) % 256 << 16) | ((i * 7) % 256 << 8) | (i % 256))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y * w + x))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val viaPng = MediaOps.Codec.feature(out.toByteArray, 8)
    val viaBmp = MediaOps.Codec.feature(RawCodec.writeBmp(w, h, px), 8)
    assert(viaPng.toSeq == viaBmp.toSeq)
  }

  test("corrupt payloads fall back to the stub, never throw") {
    // PNG magic followed by garbage: sniffs as png, fails decode
    val broken = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    assert(MediaOps.Codec.probe(broken) == MediaOps.StubCodec.probe(broken))
    assert(MediaOps.Codec.feature(broken, 4).toSeq ==
      MediaOps.StubCodec.feature(broken, 4).toSeq)
    assert(MediaOps.Codec.resize(broken, 4, 4).toSeq ==
      MediaOps.StubCodec.resize(broken, 4, 4).toSeq)
    // truncated JPEG: valid header bytes, body cut off
    val cut = encoded("jpg", 32, 32).take(60)
    assert(MediaOps.Codec.feature(cut, 4).toSeq ==
      MediaOps.StubCodec.feature(cut, 4).toSeq)
  }

  test("crafted BMP claiming huge dimensions falls back instead of OOM-ing") {
    // header says 30000x30000 (3.6 GB of pixels) but the payload is 54
    // bytes: bmpPixels must reject it BEFORE allocating, so Codec.total
    // lands in the stub instead of an OutOfMemoryError escaping
    val hdr = RawCodec.writeBmp(1, 1, Array(0)).clone()
    def put32(o: Int, v: Int): Unit = {
      hdr(o) = v.toByte; hdr(o + 1) = (v >> 8).toByte
      hdr(o + 2) = (v >> 16).toByte; hdr(o + 3) = (v >> 24).toByte
    }
    put32(18, 30000); put32(22, 30000)
    assert(MediaOps.Codec.feature(hdr, 4).toSeq ==
      MediaOps.StubCodec.feature(hdr, 4).toSeq)
    assert(MediaOps.Codec.resize(hdr, 2, 2).toSeq ==
      MediaOps.StubCodec.resize(hdr, 2, 2).toSeq)
  }
}
