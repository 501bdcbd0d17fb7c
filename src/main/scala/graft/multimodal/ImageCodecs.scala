package graft.multimodal

/** REAL image decode for the multimodal tier (replaces the md5-stub
  * codec as the production path — the stub twins remain for the
  * engine-independent oracle queries).
  *
  * Two codecs, two cost tiers:
  *   - [[ImageHeader]] / [[HeaderCodec]]: pure-JVM header parsing (PNG
  *     IHDR, JPEG SOF markers, GIF logical screen descriptor) — the
  *     100 TB metadata path. Extracting (width, height, channels) must
  *     not inflate bytes to pixels: a 100 KB JPEG parses in ~1 µs from
  *     its first KB, while a full decode materializes 30 MB of raster.
  *   - [[ImageIoCodec]]: full pixel decode via `javax.imageio` (ships
  *     with the JVM, no external deps) — the ground truth the header
  *     parser is spec-checked against, and the shape a real
  *     feature-extraction stage (resize/embed over rasters) plugs into.
  *
  * Reference scope note: the Flink reference has no multimodal tier;
  * this follows the training-data-pipeline brief (binary columns +
  * typed metadata, decode at the edge).
  */
object ImageHeader {

  /** (width, height, channels) from the payload header, or None when the
    * bytes are not a recognizable PNG/JPEG/GIF. Channels = components of
    * the decoded pixel (PNG color type / JPEG SOF component count; GIF
    * palettes are RGB triples, so 3).
    */
  def decode(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b == null || b.length < 14) None
    else if (isPng(b)) decodePng(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else if (isGif(b)) decodeGif(b)
    else None

  private def isPng(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def isGif(b: Array[Byte]): Boolean =
    b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** PNG: the IHDR chunk is REQUIRED to be first (RFC 2083 §4.1.1) —
    * width/height are big-endian u32 at offsets 16/20, color type at 25.
    */
  private def decodePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 26) return None
    // chunk length must be 13 and the type must literally be "IHDR"
    if (u32be(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' ||
      b(14) != 'D' || b(15) != 'R') return None
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val channels = (b(25) & 0xff) match {
      // a tRNS chunk adds transparency to the alpha-less color types —
      // decoders (javax.imageio included) then report one extra component:
      // grayscale -> gray+alpha, truecolor -> RGBA, palette -> RGBA
      case 0 => if (pngHasTrns(b)) 2 else 1 // grayscale
      case 2 => if (pngHasTrns(b)) 4 else 3 // truecolor
      case 3 => if (pngHasTrns(b)) 4 else 3 // palette (RGB triples + tRNS)
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return None
    }
    Some((w.toInt, h.toInt, channels))
  }

  /** Does the PNG carry a tRNS (palette transparency) chunk? Chunk walk
    * stops at IDAT — tRNS must precede it (RFC 2083 §4.2.1.1).
    */
  private def pngHasTrns(b: Array[Byte]): Boolean = {
    var i = 8
    while (i + 8 <= b.length) {
      val len = u32be(b, i)
      if (len > Int.MaxValue - 12) return false
      if (b(i + 4) == 't' && b(i + 5) == 'R' && b(i + 6) == 'N' &&
        b(i + 7) == 'S') return true
      if (b(i + 4) == 'I' && b(i + 5) == 'D' && b(i + 6) == 'A' &&
        b(i + 7) == 'T') return false
      i += 12 + len.toInt
    }
    false
  }

  /** JPEG: walk the marker segments after SOI until a start-of-frame
    * (SOF0-SOF15 minus DHT/JPG/DAC, per ITU T.81 §B.2.2): the frame
    * header carries height/width as u16 and the component count.
    */
  private def decodeJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 2
    while (i + 3 < b.length) {
      // fill bytes: any number of 0xFF may precede a marker
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      i = j + 1
      marker match {
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOF: len(2) precision(1) height(2) width(2) ncomponents(1)
          if (i + 7 >= b.length) return None
          val h = u16be(b, i + 3); val w = u16be(b, i + 5)
          val c = b(i + 7) & 0xff
          return if (w > 0 && h > 0 && c > 0) Some((w, h, c)) else None
        case 0xd8 | 0x01 => () // standalone markers: no length field
        case m if m >= 0xd0 && m <= 0xd7 => () // RSTn: standalone
        case 0xd9 => return None // EOI before any SOF
        case _ =>
          if (i + 1 >= b.length) return None
          val len = u16be(b, i)
          if (len < 2) return None
          i += len
      }
    }
    None
  }

  /** GIF: logical screen descriptor right after the 6-byte signature —
    * width/height are LITTLE-endian u16 at offsets 6/8. Channels: palette
    * entries are RGB triples (3), plus alpha when the first frame's
    * Graphic Control Extension sets the transparent-color flag — the same
    * rule javax.imageio's IndexColorModel applies, so header and full
    * decode agree on transparent GIFs.
    */
  private def decodeGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w > 0 && h > 0) Some((w, h, if (gifHasTransparency(b)) 4 else 3))
    else None
  }

  /** Walk GIF blocks up to the first image descriptor: a Graphic Control
    * Extension (0x21 0xF9) whose packed field sets bit 0 declares a
    * transparent palette index for the frame that follows.
    */
  private def gifHasTransparency(b: Array[Byte]): Boolean = {
    if (b.length < 14) return false
    var i = 13
    val packed = b(10) & 0xff
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1)) // GCT
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: introducer, label, data sub-blocks
          if (i + 1 >= b.length) return false
          val isGce = (b(i + 1) & 0xff) == 0xf9
          if (isGce && i + 3 < b.length && (b(i + 3) & 0x01) != 0) return true
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1 // block terminator
        case _ => return false // image descriptor / trailer / junk: stop
      }
    }
    false
  }
}

/** Header-parsing batch codec — the production metadata path. Rows whose
  * payload is not a parseable image decode to (-1, -1, -1) rather than
  * failing the partition (corrupt rows are data, not exceptions, at
  * 100 TB; filter on `width >= 0` downstream).
  */
class HeaderCodec extends Multimodal.BatchCodec {
  def open(): Unit = ()
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Int)] =
    payloads.map(ImageHeader.decode(_).getOrElse((-1, -1, -1)))
  def close(): Unit = ()
}

/** Full pixel decode via `javax.imageio` (in-JVM, headless): channels =
  * the color model's component count (gray 1, gray+alpha 2, RGB 3,
  * RGBA 4). Agrees with [[ImageHeader]] on every format INCLUDING
  * palette transparency: the header parser detects PNG tRNS / GIF
  * transparent-color GCE and reports 4 exactly where the IndexColorModel
  * here gains its alpha component. Unparseable payloads decode to
  * (-1, -1, -1), like [[HeaderCodec]].
  */
class ImageIoCodec extends Multimodal.BatchCodec {
  def open(): Unit = SyntheticImages.ensureHeadless()
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Int, Int, Int)] =
    payloads.map { b =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) (-1, -1, -1)
        else (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      } catch { case scala.util.control.NonFatal(_) => (-1, -1, -1) }
    }
  def close(): Unit = ()
}

/** REAL pixel transforms — the production counterparts of the md5
  * resize/embed stubs, built on the same in-JVM `javax.imageio` stack as
  * [[ImageIoCodec]]. Used per-partition inside mapPartitions (no native
  * deps, no per-row init cost).
  */
object ImageOps {
  import java.awt.image.BufferedImage

  /** Pixel-decode budget: a crafted header declaring 50k×50k would make
    * ImageIO allocate gigabytes of raster BEFORE any downstream size
    * check could run (a decompression bomb — at corpus scale an
    * adversarial document, not a hypothetical). The cheap header parse
    * rejects oversized images without touching pixel data; images the
    * header can't parse fall through to ImageIO, whose own read then
    * bounds them only by the payload (acceptable: bombs need the huge
    * DECLARED size, which the header sees).
    */
  private final val MaxPixels = 64L * 1024 * 1024

  private def withinPixelBudget(payload: Array[Byte]): Boolean =
    ImageHeader.decode(payload) match {
      case Some((w, h, _)) => w.toLong * h <= MaxPixels
      case None => true
    }

  /** Downscale so max(width, height) == `maxSide` (identity when already
    * within), bilinear onto an RGB canvas, re-encoded as PNG. Target
    * dimensions are PURE INTEGER arithmetic — `max(1, w*maxSide div
    * max(w,h))` — so a SQL oracle recomputes them without touching
    * pixels. None for unparseable payloads (corrupt rows are data) and
    * for images over the pixel budget (bombs are data too).
    */
  def resizeToMax(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] = {
    require(maxSide > 0, s"maxSide must be positive: $maxSide")
    SyntheticImages.ensureHeadless()
    if (!withinPixelBudget(payload)) return None
    // NonFatal, not just IOException: the JDK's image readers throw
    // unchecked exceptions (AIOOBE, NegativeArraySize, IAE) on malformed
    // payloads — a corrupt row is data, never a task failure
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val mx = math.max(w, h)
      val (ow, oh) = if (mx <= maxSide) (w, h)
        else (math.max(1, w * maxSide / mx), math.max(1, h * maxSide / mx))
      val target = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
      val g = target.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, ow, oh, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(target, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** `grid`×`grid` average-pooled luminance in [0, 1] (row-major;
    * 64-dim at the default grid=8) — a REAL perceptual embedding:
    * approximately invariant under downscaling and re-encoding, which is
    * exactly the property image near-dup detection needs (a thumbnail
    * and its original embed within cosine ~0.99; distinct images don't).
    * Luminance = ITU-R BT.601 integer weights (77R + 150G + 29B) >> 8.
    * None for unparseable payloads.
    */
  def lumaEmbedding(payload: Array[Byte], grid: Int = 8): Option[Array[Float]] = {
    require(grid > 0, s"grid must be positive: $grid")
    SyntheticImages.ensureHeadless()
    if (!withinPixelBudget(payload)) return None
    // NonFatal (see resizeToMax): malformed payloads throw unchecked
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Float](grid * grid)
      var cy = 0
      while (cy < grid) {
        val y0 = cy * h / grid
        val y1 = math.max(y0 + 1, (cy + 1) * h / grid)
        var cx = 0
        while (cx < grid) {
          val x0 = cx * w / grid
          val x1 = math.max(x0 + 1, (cx + 1) * w / grid)
          var sum = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              sum += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                29 * (rgb & 0xff)) >> 8
              x += 1
            }
            y += 1
          }
          val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
          out(cy * grid + cx) = if (n > 0) (sum.toFloat / n) / 255f else 0f
          cx += 1
        }
        cy += 1
      }
      Some(out)
    }
  }
}

/** Deterministically-sized REAL image fixtures, encoded by the JVM's own
  * `javax.imageio` writers: the bytes are genuine PNG/JPEG/GIF files
  * (signatures, chunk CRCs, entropy-coded scan data), so decoding them
  * exercises real parsers — while their DIMENSIONS are caller-chosen,
  * which is what lets a SQL oracle verify a decode gate query by
  * recomputing the expected size arithmetically.
  */
object SyntheticImages {
  import java.awt.image.BufferedImage

  private[multimodal] def ensureHeadless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  private def canvas(w: Int, h: Int, imgType: Int): BufferedImage = {
    ensureHeadless()
    val img = new BufferedImage(w, h, imgType)
    // cheap deterministic texture: keeps encoders honest (non-trivial
    // scan data) without a per-pixel cost explosion
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** Real PNG: color type 2 (RGB) or 0 (grayscale). */
  def png(w: Int, h: Int, gray: Boolean = false): Array[Byte] =
    encode(canvas(w, h, if (gray) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_INT_RGB), "png")

  /** Real JPEG: 3 components (YCbCr from RGB) or 1 (grayscale). */
  def jpeg(w: Int, h: Int, gray: Boolean = false): Array[Byte] =
    encode(canvas(w, h, if (gray) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_INT_RGB), "jpg")

  /** Real GIF (palette-quantized RGB). */
  def gif(w: Int, h: Int): Array[Byte] =
    encode(canvas(w, h, BufferedImage.TYPE_INT_RGB), "gif")

  /** Real transparent GIF: an ARGB canvas with fully-transparent pixels
    * forces the writer to emit a Graphic Control Extension with the
    * transparent-color flag — exercises the 4-channel GIF header path.
    */
  def gifTransparent(w: Int, h: Int): Array[Byte] = {
    ensureHeadless()
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = if ((x + y) % 3 == 0) 0x00000000
          else 0xff000000 | ((x * 31 + y * 17) & 0xffffff)
        img.setRGB(x, y, argb)
        x += 1
      }
      y += 1
    }
    encode(img, "gif")
  }

  /** Real RGBA PNG (color type 6) — exercises the 4-channel header path. */
  def pngArgb(w: Int, h: Int): Array[Byte] =
    encode(canvas(w, h, BufferedImage.TYPE_INT_ARGB), "png")

  /** Real grayscale-content PNG with a caller-chosen luminance function
    * (x, y) => 0..255 — content-controllable fixture for the perceptual
    * embedding/near-dup specs (two images are near-dups iff their `lum`
    * fields are similar, by construction).
    */
  def pngWith(w: Int, h: Int)(lum: (Int, Int) => Int): Array[Byte] = {
    ensureHeadless()
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = math.max(0, math.min(255, lum(x, y)))
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    encode(img, "png")
  }
}
