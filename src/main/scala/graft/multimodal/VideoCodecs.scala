package graft.multimodal

/** REAL video metadata for the multimodal tier — the video counterpart
  * of [[AudioHeader]]: pure-JVM RIFF/AVI header parsing (the 100 TB
  * metadata path — width / height / frame rate / frame count from the
  * first KB, no frame decode), with deterministic REAL fixtures
  * (genuine AVI files: RIFF container, hdrl LIST, 56-byte avih main
  * header, vids stream list, movi frames) whose PARAMETERS are
  * caller-chosen so a SQL oracle verifies the gate query by recomputing
  * the planted values arithmetically.
  *
  * Unlike WAV (javax.sound) there is no JVM-built-in AVI reader, so the
  * spec's ground truth is the planted parameters plus structural checks
  * (the same fixture-arithmetic contract the q111 audio gate uses).
  *
  * Reference scope note: the Flink reference has no multimodal tier;
  * this follows the training-data-pipeline brief (binary columns +
  * typed metadata, decode at the edge).
  */
object VideoHeader {

  /** (width, height, usPerFrame, nFrames) from a RIFF/AVI main header
    * ('avih', AVIMAINHEADER: dwMicroSecPerFrame@0, dwTotalFrames@16,
    * dwWidth@32, dwHeight@36), or None when the bytes are not parseable
    * AVI. Walks the top-level chunk list to the 'hdrl' LIST, then its
    * children to 'avih' — JUNK/other chunks are skipped by declared
    * length, and a length pointing past the payload end aborts the walk
    * (a corrupt ROW must never hang or crash the TASK — same contract
    * as [[AudioHeader.decodeWav]]).
    */
  def decodeAvi(b: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (b == null || b.length < 24) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None

    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")

    // walk chunks in [from, until) looking for LIST(listType); returns
    // the list's PAYLOAD bounds (after its type fourcc)
    def findList(from: Int, until: Int, listType: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= until) {
        val id = fourcc(i)
        val len = u32le(b, i + 4)
        if (len > until - (i + 8)) return None // lying length: junk file
        if (id == "LIST" && len >= 4 && fourcc(i + 8) == listType)
          return Some((i + 12, i + 8 + len.toInt))
        i += 8 + len.toInt + (len.toInt & 1) // word-aligned advance
      }
      None
    }

    findList(12, b.length, "hdrl") match {
      case None => None
      case Some((hFrom, hUntil)) =>
        // children of hdrl: avih first per spec, but walk defensively
        var i = hFrom
        while (i + 8 <= hUntil) {
          val id = fourcc(i)
          val len = u32le(b, i + 4)
          if (len > hUntil - (i + 8)) return None
          if (id == "avih") {
            // need through dwHeight@36 (+4): 40 DECLARED and available
            if (len < 40) return None
            val usPerFrame = u32le(b, i + 8)
            val frames = u32le(b, i + 8 + 16)
            val w = u32le(b, i + 8 + 32)
            val h = u32le(b, i + 8 + 36)
            return if (w > 0 && w <= Int.MaxValue && h > 0 &&
                h <= Int.MaxValue && usPerFrame > 0)
              Some((w.toInt, h.toInt, usPerFrame, frames))
            else None
          }
          i += 8 + len.toInt + (len.toInt & 1)
        }
        None
    }
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
}

/** Deterministic REAL AVI fixtures: genuine RIFF/AVI files (hdrl LIST
  * with a complete 56-byte avih main header, a vids stream list with
  * strh/strf, a movi LIST with deterministic frame chunks) whose
  * PARAMETERS are caller-chosen — the [[SyntheticAudio]] pattern for
  * video. Frame payloads are small placeholders (the metadata path
  * reads avih, never movi — real compressed streams have no fixed
  * frame size either).
  */
object SyntheticVideo {

  /** Minimal genuine AVI with the given main-header parameters. */
  def avi(w: Int, h: Int, usPerFrame: Long, frames: Long): Array[Byte] = {
    require(w > 0 && h > 0 && usPerFrame > 0 && frames >= 0, "positive params")
    val out = new java.io.ByteArrayOutputStream(512)
    def wr(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    // avih: AVIMAINHEADER, 56 bytes
    val avih = { val o = new java.io.ByteArrayOutputStream(56)
      def a32(v: Long): Unit = { o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt) }
      a32(usPerFrame); a32(0L); a32(0L); a32(0x10L /* AVIF_HASINDEX-less, flags */)
      a32(frames); a32(0L); a32(1L /* streams */); a32(0L)
      a32(w.toLong); a32(h.toLong); a32(0L); a32(0L); a32(0L); a32(0L)
      o.toByteArray }
    // strh: AVISTREAMHEADER, 56 bytes (vids / DIB, rate = 1e6/usPerFrame scaled)
    val strh = { val o = new java.io.ByteArrayOutputStream(56)
      def a32(v: Long): Unit = { o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt) }
      o.write("vids".getBytes("US-ASCII")); o.write("DIB ".getBytes("US-ASCII"))
      a32(0L); a32(0L); a32(0L)
      a32(usPerFrame) /* dwScale */; a32(1000000L) /* dwRate */
      a32(0L); a32(frames); a32(0L); a32(0L); a32(0L); a32(0L)
      o.toByteArray }
    // strf: BITMAPINFOHEADER, 40 bytes
    val strf = { val o = new java.io.ByteArrayOutputStream(40)
      def a32(v: Long): Unit = { o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt) }
      def a16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
      a32(40L); a32(w.toLong); a32(h.toLong); a16(1); a16(24)
      a32(0L); a32(w.toLong * h * 3); a32(0L); a32(0L); a32(0L); a32(0L)
      o.toByteArray }
    val strl = 4 + 8 + strh.length + 8 + strf.length  // 'strl' + chunks
    val hdrl = 4 + 8 + avih.length + 8 + strl          // 'hdrl' + avih + LIST strl
    // movi: two deterministic placeholder frames
    val frame = Array.tabulate(16)(i => ((i * 29) % 251).toByte)
    val movi = 4 + 2 * (8 + frame.length)
    val riffLen = 4 + (8 + hdrl) + (8 + movi)
    wr("RIFF"); w32(riffLen.toLong); wr("AVI ")
    wr("LIST"); w32(hdrl.toLong); wr("hdrl")
    wr("avih"); w32(avih.length.toLong); out.write(avih)
    wr("LIST"); w32(strl.toLong); wr("strl")
    wr("strh"); w32(strh.length.toLong); out.write(strh)
    wr("strf"); w32(strf.length.toLong); out.write(strf)
    wr("LIST"); w32(movi.toLong); wr("movi")
    wr("00db"); w32(frame.length.toLong); out.write(frame)
    wr("00db"); w32(frame.length.toLong); out.write(frame)
    val bytes = out.toByteArray
    // the declared RIFF length must match what was emitted (byte 4..8
    // covers everything after itself + 'AVI ')
    assert(bytes.length == 8 + riffLen, s"${bytes.length} != ${8 + riffLen}")
    bytes
  }
}
