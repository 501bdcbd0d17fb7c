package graft.multimodal

/** REAL audio metadata for the multimodal tier — the audio counterpart
  * of [[ImageHeader]]: pure-JVM RIFF/WAVE header parsing (the 100 TB
  * metadata path — sample rate / channels / duration from the first KB,
  * no sample decode), spec-checked against the JVM's own
  * `javax.sound.sampled` ground truth, with deterministic REAL fixtures
  * (genuine PCM WAV files) so a SQL oracle can verify the gate query by
  * recomputing the planted parameters arithmetically.
  *
  * Reference scope note: the Flink reference has no multimodal tier;
  * this follows the training-data-pipeline brief (binary columns +
  * typed metadata, decode at the edge).
  */
object AudioHeader {

  /** (sampleRate, channels, bitsPerSample, nFrames) from a RIFF/WAVE
    * header, or None when the bytes are not parseable PCM WAV. Walks the
    * chunk list (fmt / data may be preceded by LIST/fact etc.); duration
    * = nFrames / sampleRate.
    */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
    var dataLen = -1L
    var halt = false
    while (!halt && i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = u32le(b, i + 4)
      val avail = (b.length - (i + 8)).toLong
      if (len > avail) {
        // Declared length past the payload end: a corrupt ROW must never
        // hang or crash the TASK (a ~4 GB length would wrap negative
        // through toInt and spin the walk in place). Tolerate only the
        // truncated-final-data-chunk convention; anything else is junk.
        if (id == "data") dataLen = avail
        else return None
        halt = true // cannot advance past a lying length field
      } else {
        id match {
          case "fmt " =>
            // the DECLARED length gates the field reads, not just bytes
            // to EOF: a lying len < 16 (PCM fmt minimum) would otherwise
            // read the NEXT chunk's bytes as channels/rate/blockAlign
            if (len < 16 || avail < 16) return None
            val audioFormat = u16le(b, i + 8)
            // 1 = PCM, 0xFFFE = extensible (PCM subtype assumed)
            if (audioFormat != 1 && audioFormat != 0xfffe) return None
            ch = u16le(b, i + 10)
            rate = u32le(b, i + 12).toInt
            blockAlign = u16le(b, i + 20)
            bits = u16le(b, i + 22)
          case "data" => dataLen = len
          case _ => () // LIST, fact, cue …: skip
        }
        i += 8 + len.toInt + (len.toInt & 1) // word-aligned advance
      }
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || blockAlign <= 0 || dataLen < 0)
      None
    else Some((rate, ch, bits, dataLen / blockAlign))
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
}

/** Deterministic REAL PCM WAV fixtures: genuine RIFF/WAVE files (format
  * chunk, word-aligned data chunk, real 16-bit samples) whose PARAMETERS
  * are caller-chosen — the [[SyntheticImages]] pattern for audio, letting
  * a SQL oracle verify a metadata gate query arithmetically while the
  * parser exercises real bytes.
  */
object SyntheticAudio {

  /** 16-bit PCM WAV with `frames` frames of a deterministic sawtooth. */
  def wav(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && frames >= 0, "positive params")
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = frames * blockAlign
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(bits)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        w16(((f * 37 + c * 11) % 65536) - 32768) // deterministic sawtooth
        c += 1
      }
      f += 1
    }
    out.toByteArray
  }
}
