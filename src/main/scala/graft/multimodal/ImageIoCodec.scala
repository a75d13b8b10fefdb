package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** REAL compressed-image codec kernels via the JDK's `javax.imageio` —
  * the standard platform registers JPEG/PNG/GIF/TIFF/BMP/WBMP readers,
  * so probe/resize/feature for compressed formats need NO external
  * library. Kernels here follow the same contracts as [[RawCodec]]'s
  * BMP path: probe reads dimensions from the header WITHOUT decoding
  * pixels (an `ImageReader` on a stream decodes metadata only), resize
  * is nearest-neighbor, the feature is pooled mean gray mapped to
  * [-1, 1]. All entry points are dispatched through
  * [[MediaOps.Codec]]'s total-at-the-boundary wrapper, so a corrupt or
  * truncated payload falls back to [[MediaOps.StubCodec]] instead of
  * aborting the job.
  */
object ImageIoCodec {

  /** Magic-byte sniff for the compressed image formats the JDK decodes.
    * (BMP is deliberately absent: [[RawCodec]]'s byte-layout kernel owns
    * it and is checked first by the dispatcher.) */
  def sniff(content: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = content.length > i && (content(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("jpeg")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) Some("gif")
    else if ((at(0, 'I') && at(1, 'I') && at(2, 0x2a) && at(3, 0)) ||
             (at(0, 'M') && at(1, 'M') && at(2, 0) && at(3, 0x2a))) Some("tiff")
    else None
  }

  /** Dimensions from the image header only: an `ImageReader` bound to
    * the stream reads metadata without decoding the pixel planes — the
    * probe cost of a 50 MB JPEG is a few KB of header, which is what
    * lets a metadata-only `decode()` pass run at corpus scale. */
  def probe(content: Array[Byte], format: String): MediaMeta = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no ImageIO reader for sniffed $format")
      val r = readers.next()
      try {
        r.setInput(iis)
        MediaMeta(format, r.getWidth(0), r.getHeight(0), 0L)
      } finally r.dispose()
    } finally iis.close()
  }

  /** Decode cap: a full decode allocates a w×h raster, so dimensions are
    * bounded BEFORE `ImageIO.read` — a tiny crafted PNG/GIF/TIFF can
    * declare billions of pixels (decompression bomb) and the resulting
    * OutOfMemoryError is an Error, not NonFatal, so it would escape
    * [[MediaOps.Codec]]'s total-at-the-boundary fallback and kill the
    * task. 100M pixels ≈ a 400 MB ARGB raster — beyond any sane corpus
    * image; such payloads fall back to the stub via the require. */
  private val MaxDecodePixels = 100L * 1000 * 1000

  private def read(content: Array[Byte]): BufferedImage = {
    // header-only dimension check first (same mechanism as probe —
    // metadata read, no pixel decode), mirroring the BMP geometry guard
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader for payload")
      val r = readers.next()
      try {
        r.setInput(iis)
        val w = r.getWidth(0).toLong
        val h = r.getHeight(0).toLong
        require(w > 0 && h > 0 && w * h <= MaxDecodePixels,
          s"image declares ${w}x$h — exceeds the $MaxDecodePixels-pixel decode cap")
      } finally r.dispose()
    } finally iis.close()
    val img = ImageIO.read(new ByteArrayInputStream(content))
    require(img != null, "ImageIO could not decode payload")
    img
  }

  /** Nearest-neighbor resize re-encoded in the SOURCE format (the JDK
    * ships writers for every format it reads among png/jpeg/gif/bmp;
    * tiff included on modern JDKs). JPEG has no alpha, so the raster
    * is forced to RGB before encoding. */
  def resize(content: Array[Byte], format: String, w2: Int, h2: Int): Array[Byte] = {
    val src = read(content)
    val kind =
      if (format == "jpeg") BufferedImage.TYPE_INT_RGB
      else BufferedImage.TYPE_INT_ARGB
    val dst = new BufferedImage(w2, h2, kind)
    val w = src.getWidth; val h = src.getHeight
    var y = 0
    while (y < h2) {
      val sy = math.min(h - 1, y * h / h2)
      var x = 0
      while (x < w2) {
        dst.setRGB(x, y, src.getRGB(math.min(w - 1, x * w / w2), sy))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val name = if (format == "jpeg") "jpg" else format
    require(ImageIO.write(dst, name, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Pooled mean-gray feature identical in shape to
    * [[RawCodec.bmpFeature]]: pixels in reading order, `dim` buckets,
    * bucket mean gray mapped to [-1, 1]. */
  def feature(content: Array[Byte], dim: Int): Array[Float] = {
    val img = read(content)
    val w = img.getWidth; val h = img.getHeight
    RawCodec.bucketMeans(w * h, dim) { i =>
      val p = img.getRGB(i % w, i / w)
      ((((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0) / 255.0
    }
  }
}
