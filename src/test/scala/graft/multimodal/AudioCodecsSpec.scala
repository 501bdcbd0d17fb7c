package graft.multimodal

import graft.SparkSpec

class AudioCodecsSpec extends SparkSpec {
  import spark.implicits._

  private val params = Seq(
    (8000, 1, 100), (16000, 2, 997), (22050, 1, 1), (44100, 2, 0))

  test("WAV header parse matches javax.sound.sampled ground truth") {
    for ((rate, ch, frames) <- params) {
      val bytes = SyntheticAudio.wav(rate, ch, frames)
      val parsed = AudioHeader.decodeWav(bytes)
      assert(parsed.contains((rate, ch, 16, frames.toLong)),
        s"($rate,$ch,$frames) parsed as $parsed")
      // the fixtures are REAL WAV files: the JVM's own audio stack reads
      // the same parameters back out
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        assert(fmt.getSampleRate == rate.toFloat &&
          fmt.getChannels == ch &&
          fmt.getSampleSizeInBits == 16 &&
          in.getFrameLength == frames.toLong,
          s"javax.sound disagrees: $fmt frames=${in.getFrameLength}")
      } finally in.close()
    }
  }

  test("WAV parse skips interposed chunks and survives corrupt payloads") {
    // inject a LIST chunk between fmt and data (players do this)
    val base = SyntheticAudio.wav(16000, 1, 50)
    val fmtEnd = 12 + 8 + 16
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val padded = base.take(fmtEnd) ++ listChunk ++ base.drop(fmtEnd)
    assert(AudioHeader.decodeWav(padded).contains((16000, 1, 16, 50L)))
    // corrupt rows are data, not exceptions
    assert(AudioHeader.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioHeader.decodeWav(base.take(30)).isEmpty)
    assert(AudioHeader.decodeWav(null).isEmpty)
    // regression: a chunk declaring a ~4 GB length used to wrap negative
    // through toInt and spin the walk in place (hung task) or drive the
    // index negative (crash) — must return None, fast
    val lying = base.take(12) ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      base.drop(20)
    assert(AudioHeader.decodeWav(lying).isEmpty)
    // truncated final data chunk (declared > present): tolerated, frames
    // derived from the bytes actually present
    val truncated = base.dropRight(40)
    assert(AudioHeader.decodeWav(truncated)
      .contains((16000, 1, 16, 30L))) // 50 frames - 40 bytes/2Bpf = 30
    // regression: a fmt chunk DECLARING len < 16 (the PCM minimum) used to
    // read the next chunk's bytes as channels/rate/blockAlign (plenty of
    // bytes remain to EOF, so the avail guard alone never fired) and
    // return garbage metadata — must be None
    val shortFmt = base.clone()
    shortFmt(16) = 12 // fmt chunk length field: 16 -> 12
    assert(AudioHeader.decodeWav(shortFmt).isEmpty)
  }

  test("audioMetaPartitioned: real parse + integer duration, corrupt -> -1") {
    val df = Seq(
      (1L, SyntheticAudio.wav(8000, 2, 4000)),
      (2L, SyntheticAudio.wav(44100, 1, 44100)),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.audioMetaPartitioned(df, "id", "payload")
      .select($"id", $"sample_rate", $"channels", $"n_frames", $"duration_ms")
      .as[(Long, Int, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 8000, 2, 4000L, 500L)))
    assert(out(2L) == ((2L, 44100, 1, 44100L, 1000L)))
    assert(out(3L) == ((3L, -1, -1, -1L, -1L)))
  }
}
