package graft.multimodal

import graft.SparkSpec

/** The REAL image-decode tier: [[ImageHeader]] parses genuine encoded
  * bytes, with full-pixel `javax.imageio` decode as ground truth.
  */
class ImageCodecsSpec extends SparkSpec {
  import spark.implicits._

  private val sizes = Seq((8, 8), (97, 53), (640, 1), (1, 480), (257, 129))

  test("PNG header parse matches ImageIO ground truth (gray/RGB/RGBA)") {
    val iio = new ImageIoCodec; iio.open()
    for ((w, h) <- sizes;
         bytes <- Seq(SyntheticImages.png(w, h), SyntheticImages.png(w, h, gray = true),
           SyntheticImages.pngArgb(w, h))) {
      val parsed = ImageHeader.decode(bytes)
      assert(parsed.isDefined, s"no parse for ${w}x$h png")
      assert(parsed.get == iio.decodeBatch(Seq(bytes)).head,
        s"header vs pixel decode disagree for ${w}x$h png")
    }
  }

  test("JPEG header parse matches ImageIO ground truth (gray/RGB)") {
    val iio = new ImageIoCodec; iio.open()
    for ((w, h) <- sizes;
         bytes <- Seq(SyntheticImages.jpeg(w, h), SyntheticImages.jpeg(w, h, gray = true))) {
      val parsed = ImageHeader.decode(bytes)
      assert(parsed.isDefined, s"no parse for ${w}x$h jpeg")
      assert(parsed.get == iio.decodeBatch(Seq(bytes)).head,
        s"header vs pixel decode disagree for ${w}x$h jpeg")
    }
  }

  test("JPEG parse skips injected APPn segments (EXIF-shaped files)") {
    // splice an APP1 segment right after SOI — the marker walk must skip
    // it by its length field and still find the SOF
    val base = SyntheticImages.jpeg(41, 23)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0x00, 0x08,
      'E', 'x', 'i', 'f', 0x00, 0x00)
    val spliced = base.take(2) ++ app1 ++ base.drop(2)
    assert(ImageHeader.decode(spliced).contains((41, 23, 3)))
  }

  test("GIF header parse reads the little-endian screen descriptor") {
    for ((w, h) <- sizes) {
      val parsed = ImageHeader.decode(SyntheticImages.gif(w, h))
      assert(parsed.contains((w, h, 3)), s"gif ${w}x$h parsed as $parsed")
    }
  }

  /** Splice a well-formed tRNS chunk (correct CRC) right after IHDR —
    * tRNS must precede IDAT, and real encoders place it there.
    */
  private def withTrns(png: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val insertAt = 8 + 8 + 13 + 4 // signature + IHDR(len,type,data,crc)
    val typ = "tRNS".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(typ); crc.update(payload)
    val buf = java.nio.ByteBuffer.allocate(12 + payload.length)
    buf.putInt(payload.length).put(typ).put(payload).putInt(crc.getValue.toInt)
    png.take(insertAt) ++ buf.array() ++ png.drop(insertAt)
  }

  test("tRNS on grayscale/truecolor PNGs adds the alpha channel") {
    // color type 0 + tRNS (2-byte gray sample) -> gray+alpha; color type
    // 2 + tRNS (6-byte RGB sample) -> RGBA. ImageIO's PNG reader honors
    // tRNS the same way — parity on the full decode, not just a claim.
    val iio = new ImageIoCodec; iio.open()
    val gray = withTrns(SyntheticImages.png(31, 17, gray = true),
      Array[Byte](0, 42))
    val rgb = withTrns(SyntheticImages.png(31, 17),
      Array[Byte](0, 10, 0, 20, 0, 30))
    assert(ImageHeader.decode(gray).contains((31, 17, 2)))
    assert(ImageHeader.decode(rgb).contains((31, 17, 4)))
    assert(iio.decodeBatch(Seq(gray)).head == ((31, 17, 2)))
    assert(iio.decodeBatch(Seq(rgb)).head == ((31, 17, 4)))
  }

  test("transparent GIF: header alpha detection matches ImageIO") {
    val iio = new ImageIoCodec; iio.open()
    for ((w, h) <- sizes) {
      val bytes = SyntheticImages.gifTransparent(w, h)
      val header = ImageHeader.decode(bytes)
      val truth = iio.decodeBatch(Seq(bytes)).head
      assert(header.contains(truth),
        s"transparent gif ${w}x$h: header $header != imageio $truth")
      assert(truth._3 == 4, s"fixture not transparent: $truth")
    }
  }

  test("corrupt and non-image payloads decode to (-1,-1,-1), not errors") {
    val codec = new HeaderCodec
    val garbage = Seq(
      "not an image at all".getBytes("UTF-8"),
      Array[Byte](0xff.toByte, 0xd8.toByte), // bare SOI, truncated
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), // sig only
      SyntheticImages.png(64, 64).take(20), // truncated mid-IHDR
      Array.empty[Byte])
    assert(codec.decodeBatch(garbage).forall(_ == (-1, -1, -1)))
  }

  test("decodePartitioned + HeaderCodec round-trips real images end to end") {
    val rows = (0L until 60L).map { id =>
      val w = (id % 19 + 4).toInt; val h = (id % 11 + 4).toInt
      val bytes = (id % 3) match {
        case 0 => SyntheticImages.png(w, h, gray = id % 2 == 1)
        case 1 => SyntheticImages.jpeg(w, h)
        case _ => SyntheticImages.gif(w, h)
      }
      (id, bytes, w, h)
    }
    val df = rows.map(r => (r._1, r._2)).toDF("id", "payload").repartition(4)
    val out = Multimodal.decodePartitioned(df, "id", "payload",
        () => new HeaderCodec, batchSize = 7)
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 60)
    rows.foreach { case (id, _, w, h) => assert(out(id) == (w, h)) }
  }

  test("sniffFormat agrees with the fixtures' real formats") {
    val df = Seq(
      (1L, SyntheticImages.png(9, 9)),
      (2L, SyntheticImages.jpeg(9, 9)),
      (3L, SyntheticImages.gif(9, 9))).toDF("id", "payload")
    val got = df.select($"id", Multimodal.sniffFormat($"payload").as("f"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif"))
  }

  test("resizeToMax: integer-law geometry, identity under maxSide, min 1") {
    def dims(b: Array[Byte]): (Int, Int) = {
      val (w, h, _) = ImageHeader.decode(b).get; (w, h)
    }
    // downscale: 100x50 -> 32x16 (w*32/100, h*32/100)
    assert(dims(ImageOps.resizeToMax(SyntheticImages.png(100, 50), 32).get)
      == (32, 16))
    // identity when already within
    assert(dims(ImageOps.resizeToMax(SyntheticImages.jpeg(20, 10), 32).get)
      == (20, 10))
    // extreme aspect: the short side clamps to 1, never 0
    assert(dims(ImageOps.resizeToMax(SyntheticImages.png(200, 3), 32).get)
      == (32, 1))
    // landscape/portrait symmetry
    assert(dims(ImageOps.resizeToMax(SyntheticImages.gif(50, 100), 32).get)
      == (16, 32))
    // corrupt payload: None, not an exception
    assert(ImageOps.resizeToMax("junk".getBytes("UTF-8"), 32).isEmpty)
    // decompression bomb: a valid PNG HEADER declaring 50000x50000 (no
    // real pixel data needed — the bomb is the declared size) must be
    // rejected by the header-parse budget BEFORE ImageIO allocates
    val bomb = {
      val real = SyntheticImages.png(8, 8)
      // IHDR width at offset 16, height at 20 (big-endian u32)
      def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
        b(off) = ((v >> 24) & 0xff).toByte; b(off + 1) = ((v >> 16) & 0xff).toByte
        b(off + 2) = ((v >> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
      }
      val hacked = real.clone()
      putU32(hacked, 16, 50000L); putU32(hacked, 20, 50000L)
      hacked
    }
    assert(ImageOps.resizeToMax(bomb, 32).isEmpty)
    assert(ImageOps.lumaEmbedding(bomb).isEmpty)
  }

  test("lumaEmbedding is a real pixel read and survives resizing") {
    // content-controlled fixtures: horizontal vs vertical gradients
    def hGrad(w: Int, h: Int) =
      SyntheticImages.pngWith(w, h)((x, _) => x * 255 / math.max(1, w - 1))
    def vGrad(w: Int, h: Int) =
      SyntheticImages.pngWith(w, h)((_, y) => y * 255 / math.max(1, h - 1))
    val a = ImageOps.lumaEmbedding(hGrad(120, 80)).get
    // pixel-read sanity: left column dark, right column bright
    assert(a(0) < 0.2 && a(7) > 0.8, s"gradient not read: ${a.toSeq}")
    // scale invariance: the thumbnail's embedding stays close to the
    // original's (L2 over 64 dims), while a different image is far
    val aSmall = ImageOps.lumaEmbedding(
      ImageOps.resizeToMax(hGrad(120, 80), 32).get).get
    val b = ImageOps.lumaEmbedding(vGrad(120, 80)).get
    def l2(u: Array[Float], v: Array[Float]): Double =
      math.sqrt(u.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(l2(a, aSmall) < 0.1 * l2(a, b),
      s"resize moved the embedding: same=${l2(a, aSmall)} diff=${l2(a, b)}")
  }

  test("imageNearDupsByLuma pairs an image with its thumbnail only") {
    def hGrad(w: Int, h: Int) =
      SyntheticImages.pngWith(w, h)((x, _) => x * 255 / math.max(1, w - 1))
    def vGrad(w: Int, h: Int) =
      SyntheticImages.pngWith(w, h)((_, y) => y * 255 / math.max(1, h - 1))
    def diag(w: Int, h: Int) =
      SyntheticImages.pngWith(w, h)((x, y) =>
        (x + y) * 255 / math.max(1, w + h - 2))
    val df = Seq(
      (1L, hGrad(120, 80)),
      (2L, ImageOps.resizeToMax(hGrad(120, 80), 48).get), // thumbnail of 1
      (3L, vGrad(120, 80)),
      (4L, diag(100, 100))).toDF("id", "payload")
    val pairs = Multimodal.imageNearDupsByLuma(df, "id", "payload",
        threshold = 0.995)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("resizePartitioned emits resized payloads + re-parsed dims") {
    val df = Seq(
      (1L, SyntheticImages.png(100, 50)),
      (2L, SyntheticImages.jpeg(10, 10)),
      (3L, "garbage".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.resizePartitioned(df, "id", "payload", maxSide = 32)
      .select($"id", $"width", $"height").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (32, 16))
    assert(out(2L) == (10, 10)) // within bound: pass-through re-encode
    assert(out(3L) == (-1, -1)) // corrupt row is data, not an exception
  }
}
