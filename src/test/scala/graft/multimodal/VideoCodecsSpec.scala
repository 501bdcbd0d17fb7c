package graft.multimodal

import graft.SparkSpec

class VideoCodecsSpec extends SparkSpec {
  import spark.implicits._

  private val params = Seq(
    (16, 16, 33333L, 24L), (640, 480, 16667L, 1L),
    (128, 96, 40000L, 997L), (32, 96, 100000L, 0L))

  test("AVI header parse reads back the planted main-header parameters") {
    for ((w, h, uspf, frames) <- params) {
      val bytes = SyntheticVideo.avi(w, h, uspf, frames)
      val parsed = VideoHeader.decodeAvi(bytes)
      assert(parsed.contains((w, h, uspf, frames)),
        s"($w,$h,$uspf,$frames) parsed as $parsed")
    }
  }

  test("AVI parse skips interposed chunks and survives corrupt payloads") {
    val base = SyntheticVideo.avi(64, 48, 33333L, 100L)
    // inject a JUNK chunk between 'AVI ' and the hdrl LIST (real muxers
    // pad exactly there) — the walk must skip it by declared length
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "padpad".getBytes("US-ASCII")
    val padded = base.take(12) ++ junk ++ base.drop(12)
    assert(VideoHeader.decodeAvi(padded).contains((64, 48, 33333L, 100L)))
    // corrupt rows are data, not exceptions
    assert(VideoHeader.decodeAvi("not a video".getBytes("UTF-8")).isEmpty)
    assert(VideoHeader.decodeAvi(base.take(20)).isEmpty)
    assert(VideoHeader.decodeAvi(null).isEmpty)
    assert(VideoHeader.decodeAvi(Array.empty[Byte]).isEmpty)
    // a chunk declaring a ~4 GB length must abort the walk, fast,
    // instead of wrapping negative or scanning past the payload
    val lying = base.clone()
    lying(16) = 0xf8.toByte; lying(17) = 0xff.toByte
    lying(18) = 0xff.toByte; lying(19) = 0xff.toByte
    assert(VideoHeader.decodeAvi(lying).isEmpty)
    // an avih DECLARING fewer than 40 bytes must not read neighboring
    // chunk bytes as width/height (the WAV fmt-length lesson)
    val shortAvih = base.clone()
    shortAvih(28) = 32 // avih len field: 56 -> 32
    assert(VideoHeader.decodeAvi(shortAvih).isEmpty)
  }

  test("cross-codec: WAV is not AVI and AVI is not WAV or image") {
    val avi = SyntheticVideo.avi(64, 48, 33333L, 10L)
    val wav = SyntheticAudio.wav(8000, 1, 10)
    // both are RIFF containers — the form type must discriminate
    assert(VideoHeader.decodeAvi(wav).isEmpty)
    assert(AudioHeader.decodeWav(avi).isEmpty)
    assert(ImageHeader.decode(avi).isEmpty)
  }

  test("videoMetaPartitioned: real parse + integer duration, corrupt -> -1") {
    val df = Seq(
      (1L, SyntheticVideo.avi(320, 240, 33333L, 300L)),
      (2L, SyntheticVideo.avi(64, 64, 40000L, 25L)),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.videoMetaPartitioned(df, "id", "payload")
      .select($"id", $"width", $"height", $"us_per_frame", $"n_frames",
        $"duration_ms")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 320, 240, 33333L, 300L, 9999L)))
    assert(out(2L) == ((2L, 64, 64, 40000L, 25L, 1000L)))
    assert(out(3L) == ((3L, -1, -1, -1L, -1L, -1L)))
  }

  test("meta composes with sampleFrames: duration drives frame indices") {
    import org.apache.spark.sql.functions.md5
    val df = Seq((1L, SyntheticVideo.avi(64, 48, 33333L, 900L)))
      .toDF("id", "payload")
    val meta = Multimodal.videoMetaPartitioned(df, "id", "payload")
      .withColumn("dur", $"duration_ms" / 1000.0)
      .withColumn("content_hash", md5($"id".cast("string").cast("binary")))
    val sampled = Multimodal.sampleFrames(meta, "dur", everyNSec = 10.0)
    // 900 frames at 33333 µs/frame = 29.999 s -> samples at 0/10/20 s
    assert(sampled.count() == 3)
  }
}
