package graft.multimodal

/** REAL pure-JVM media header codecs — the de-stubbed corner of the
  * multimodal stack (no native libs needed): a RIFF/WAVE chunk walker
  * and a BMP `BITMAPINFOHEADER` reader. Everything else behind
  * [[MediaCodec]] stays the declared deterministic stub (JPEG/MP4
  * decoding needs libraries this container doesn't have), but for
  * these two formats the metadata columns come from parsing actual
  * bytes — and the parser is a general chunk walker, not a
  * fixed-offset peek, so non-canonical files (extra LIST/INFO chunks
  * before `fmt `) parse correctly (spec-asserted on hand-built
  * fixtures).
  */
object WavCodec {

  /** Parsed `fmt ` + `data` facts of a RIFF/WAVE payload. */
  final case class WavMeta(
      channels: Int, sampleRateHz: Int, bitsPerSample: Int,
      byteRate: Int, dataBytes: Long) {
    /** Floor milliseconds of audio in the data chunk. */
    def durationMs: Long =
      if (byteRate <= 0) 0L else dataBytes * 1000L / byteRate
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF chunk list: `RIFF<size>WAVE` then (id, size, body)
    * chunks until both `fmt ` and `data` are seen. Returns None on
    * anything that is not a well-formed WAVE. A `data` chunk whose
    * declared size overruns the payload is clamped to the bytes
    * actually present (streaming writers leave the size field stale —
    * the lenient read every real decoder does). */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, byteRate, bits
    var data: Option[Long] = None
    while (o + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, o)
      val sz = u32(b, o + 4)
      val body = o + 8
      if (id == "fmt " && sz >= 16 && body + 16 <= b.length)
        fmt = Some((u16(b, body + 2), u32(b, body + 4).toInt,
          u32(b, body + 8).toInt, u16(b, body + 14)))
      else if (id == "data")
        data = Some(math.min(sz, (b.length - body).toLong))
      // chunks are word-aligned: odd sizes carry a pad byte. Advance in
      // Long so a hostile u32 size (e.g. 0xFFFFFFF8 → Int -8) can't stall
      // or rewind the walk — any non-advancing/overflowing offset ends
      // the scan with whatever fmt/data was seen so far.
      val next = body.toLong + sz + (sz & 1L)
      if (next <= o || next > Int.MaxValue) o = b.length
      else o = next.toInt
    }
    for ((ch, rate, br, bits) <- fmt; d <- data)
      yield WavMeta(ch, rate, bits, br, d)
  }

  /** Canonical 44-byte-header PCM WAV writer — the independent code
    * path the parser round-trips against (writer encodes, parser
    * must read back the exact fields from the bytes). */
  def writeWav(
      sampleRateHz: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRateHz * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    val bb = java.nio.ByteBuffer
      .allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRateHz).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }
}

/** BMP `BITMAPINFOHEADER` reader: width/height from real bytes. */
object BmpCodec {

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** (width, height) of a BMP payload; height may be stored negative
    * (top-down rows) — reported as magnitude, like any viewer. */
  def parseBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte &&
        i32(b, 14) >= 40)
      Some((i32(b, 18), math.abs(i32(b, 22))))
    else None
}
