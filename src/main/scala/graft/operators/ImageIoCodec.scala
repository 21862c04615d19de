package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** PRODUCTION [[Multimodal.MediaCodec]] for still images, built on the
  * JDK's `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP readers ship with the
  * JRE — zero added dependencies, which matters in this container and
  * on a locked-down cluster image). This is the real implementation
  * behind the injectable seam that `FakeCodec` stubs: decode, header
  * sniffing, pixel statistics, bounded re-encode, and strip-sampled
  * "frames" all run against actual image bytes.
  *
  * Codec contract notes (see [[Multimodal.MediaCodec]]):
  *  - PURE: every method is a function of the payload bytes; ImageIO
  *    is used through memory-cached streams only (no tmp-file cache),
  *    so speculative re-runs produce identical rows.
  *  - CORRUPT-SAFE where the operator cannot catch: [[sniffFormat]] /
  *    [[dims]] / [[durationMs]] are called by `withMetadata` outside a
  *    try, so they degrade ("bin", (-1, -1), 0) instead of throwing —
  *    at 100 TB some shard WILL hold garbage bytes. [[features]] /
  *    [[resize]] / [[sampleFrames]] throw on undecodable payloads and
  *    rely on the operators' null-on-corrupt handling.
  *  - Header-only where possible: [[dims]] reads width/height from the
  *    format header via an `ImageReader` WITHOUT decoding the raster —
  *    `withMetadata` stays safe to run over a full corpus.
  */
object ImageIoCodec extends Multimodal.MediaCodec {

  /** Run `f` over a header reader for the payload, None if no
    * installed reader claims the format.
    */
  private def withReader[A](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => A): Option[A] = {
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis, true, true); Some(f(r)) }
        finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  private def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new javax.imageio.IIOException(
        s"no installed ImageIO reader decodes this ${bytes.length}-byte payload")
    img
  }

  /** PNG-encode (lossless, always available) — also the helper query
    * generators use to PLANT real images, so encode and decode
    * exercise the same ImageIO stack end-to-end.
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A w×h constant-color RGB image, PNG-encoded — the deterministic
    * fixture for oracle-gated roundtrip queries: every decoded pixel
    * statistic of the result is known in closed form.
    */
  def constantPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, px); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** A 9·cellW × 8·cellH grayscale PNG whose (cy, cx) cell is the
    * constant gray `cells(cy*9 + cx)` — the deterministic fixture for
    * perceptual-hash queries: [[luma9x8]] recovers `cells` EXACTLY
    * (each grid cell area-averages identical pixels, and gray r=g=b=v
    * makes the integer luma (299+587+114)·v/1000 = v), so the dHash of
    * the decoded image is a closed-form integer function of `cells`.
    */
  def grayGridPng(cells: Array[Int], cellW: Int, cellH: Int): Array[Byte] = {
    require(cells.length == 72, s"need 9x8 = 72 cells, got ${cells.length}")
    val img = new BufferedImage(9 * cellW, 8 * cellH, BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val v = cells(cy * 9 + cx) & 0xFF
        val px = (v << 16) | (v << 8) | v
        var y = cy * cellH
        while (y < (cy + 1) * cellH) {
          var x = cx * cellW
          while (x < (cx + 1) * cellW) { img.setRGB(x, y, px); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    encodePng(img)
  }

  /** 9×8 integer luma grid by EXACT integer area-averaging: cell
    * (cy, cx) covers pixel rows [h·cy/8, h·(cy+1)/8) × cols
    * [w·cx/9, w·(cx+1)/9), and its value is
    * floor(Σ (299R + 587G + 114B) / (pixels · 1000)) — all integer
    * arithmetic, so the grid is bit-identical on any JVM and
    * recomputable in closed form for planted fixtures. For dims that
    * are multiples of (9, 8) every cell is the exact block mean.
    */
  def luma9x8(bytes: Array[Byte]): Array[Int] = {
    val img = decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](72)
    var cy = 0
    while (cy < 8) {
      val y0 = (h.toLong * cy / 8).toInt
      val y1 = math.max(y0 + 1, (h.toLong * (cy + 1) / 8).toInt)
      var cx = 0
      while (cx < 9) {
        val x0 = (w.toLong * cx / 9).toInt
        val x1 = math.max(x0 + 1, (w.toLong * (cx + 1) / 9).toInt)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val px = img.getRGB(x, y)
            s += 299L * ((px >> 16) & 0xFF) + 587L * ((px >> 8) & 0xFF) +
              114L * (px & 0xFF)
            x += 1
          }
          y += 1
        }
        out(cy * 9 + cx) = (s / ((y1 - y0).toLong * (x1 - x0) * 1000L)).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash — Krawetz's "Kind of Like That"
    * gradient hash, 2013; the standard cheap perceptual image
    * fingerprint): bit (cy·8 + cx) is set iff the 9×8 luma grid has
    * cell (cy, cx) strictly brighter than its right neighbor. Robust
    * to re-encoding, scaling and global brightness shifts (all
    * preserve left-vs-right ordering); integer-exact end to end, so a
    * planted fixture's hash is recomputable arithmetically.
    */
  def dHash64(bytes: Array[Byte]): Long = {
    val g = luma9x8(bytes)
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (g(cy * 9 + cx) > g(cy * 9 + cx + 1)) hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  def sniffFormat(bytes: Array[Byte]): String =
    withReader(bytes)(_.getFormatName.toLowerCase).getOrElse("bin")

  /** Header-only width/height; (-1, -1) when unreadable. */
  def dims(bytes: Array[Byte]): (Int, Int) =
    withReader(bytes)(r => (r.getWidth(0), r.getHeight(0))).getOrElse((-1, -1))

  /** Still images have no duration. */
  def durationMs(bytes: Array[Byte]): Long = 0L

  /** 8-dim pixel statistics, each in [0, 1] (channel values
    * normalized by 255): mean R, mean G, mean B, mean luma
    * (0.299 R + 0.587 G + 0.114 B), stddev R, stddev G, stddev B,
    * and w/(w+h) as a bounded aspect proxy. Channel sums are exact
    * integer arithmetic; only the final normalization is floating
    * point, so constant-color fixtures recover their planted channel
    * values to float precision.
    */
  def features(bytes: Array[Byte]): Array[Float] = {
    val img = decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sr, sg, sb = 0L
    var sr2, sg2, sb2 = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val r = (px >> 16) & 0xFF
        val g = (px >> 8) & 0xFF
        val b = px & 0xFF
        sr += r; sg += g; sb += b
        sr2 += r.toLong * r; sg2 += g.toLong * g; sb2 += b.toLong * b
        x += 1
      }
      y += 1
    }
    val mr = sr.toDouble / n
    val mg = sg.toDouble / n
    val mb = sb.toDouble / n
    def std(s2: Long, m: Double) = math.sqrt(math.max(0.0, s2.toDouble / n - m * m))
    Array(
      (mr / 255.0).toFloat, (mg / 255.0).toFloat, (mb / 255.0).toFloat,
      ((0.299 * mr + 0.587 * mg + 0.114 * mb) / 255.0).toFloat,
      (std(sr2, mr) / 255.0).toFloat, (std(sg2, mg) / 255.0).toFloat,
      (std(sb2, mb) / 255.0).toFloat,
      (w.toDouble / (w + h)).toFloat)
  }

  /** Re-encode within a byte budget: halve dimensions (area ÷4 per
    * step, so the loop is log-bounded) until the lossless PNG fits.
    * Payloads already inside the budget pass through untouched.
    */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) return bytes
    var img = decode(bytes)
    var out = encodePng(img)
    while (out.length > maxBytes && (img.getWidth > 1 || img.getHeight > 1)) {
      val nw = math.max(1, img.getWidth / 2)
      val nh = math.max(1, img.getHeight / 2)
      val scaled = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val gfx = scaled.createGraphics()
      try gfx.drawImage(img, 0, 0, nw, nh, null) finally gfx.dispose()
      img = scaled
      out = encodePng(img)
    }
    out
  }

  /** "Frames" of a still image: n horizontal strips, PNG-encoded —
    * the same (id, frame_idx, bytes) explode shape a video decoder
    * would feed, exercised with real decoded pixels. Strips cover the
    * image top to bottom; a degenerate 1-pixel-tall image yields n
    * copies of its only row.
    */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val img = decode(bytes)
    val h = img.getHeight
    (0 until n).map { i =>
      val y0 = math.min((h.toLong * i / math.max(n, 1)).toInt, h - 1)
      val y1 = math.max(y0 + 1, math.min((h.toLong * (i + 1) / math.max(n, 1)).toInt, h))
      encodePng(img.getSubimage(0, y0, img.getWidth, y1 - y0))
    }
  }
}
