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
}
