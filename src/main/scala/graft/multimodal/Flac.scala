package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

/** FLAC metadata walk — the COMPRESSED-audio sibling of [[Wav]]'s
  * RIFF walker (WAV is the PCM case; crawled audio is overwhelmingly
  * compressed, and a triage pipeline reads the metadata blocks
  * without paying a frame decode, which this container makes
  * possible by design: all stream facts live in STREAMINFO up
  * front). Format per the public FLAC spec (RFC 9639):
  *
  *   `fLaC` magic, then metadata blocks, each headed by 1 byte
  *   (bit 7 = last-block flag, bits 0..6 = type; 0 = STREAMINFO,
  *   1 = PADDING, 4 = VORBIS_COMMENT) + a 24-bit BIG-endian length.
  *   STREAMINFO (34 bytes) bit-packs: min/max blocksize u16,
  *   min/max framesize u24, then a 64-bit field holding the 20-bit
  *   sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit total
  *   samples, then a 16-byte MD5. VORBIS_COMMENT is LITTLE-endian
  *   (it is an embedded Ogg Vorbis structure): vendor length u32le +
  *   vendor, count u32le, then per comment u32le length +
  *   `KEY=value` UTF-8. The endianness SWITCH inside one container
  *   is exactly the parser slip class this walker's gate pins.
  *
  * Hostile-input discipline of the walker family: missing magic /
  * no leading STREAMINFO / block length past the buffer classify
  * instead of throwing; unknown block types are skipped by length;
  * block and comment counts are capped. Frame DECODE stays out of
  * scope (documented at [[Media]] — no codec in this environment);
  * everything here is real byte walking.
  */
object Flac {

  val MaxBlocks = 4096
  val MaxComments = 4096

  /** The walk's result; fields None unless an intact STREAMINFO led
    * the file (the spec mandates it). duration follows the demuxer
    * arithmetic totalSamples·1000/sampleRate, floored. */
  final case class FlacMeta(
      status: String, // ok | not_flac | no_streaminfo | truncated
      sampleRate: Option[Int],
      channels: Option[Int],
      bitsPerSample: Option[Int],
      totalSamples: Option[Long],
      nBlocks: Int,
      comments: Map[String, String]) {
    def durationMs: Option[Long] = for {
      ts <- totalSamples; sr <- sampleRate if sr > 0
    } yield ts * 1000L / sr
  }

  private val Magic = "fLaC".getBytes(UTF_8)

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u24be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Parse the metadata blocks. Never throws on hostile bytes. */
  def parse(bytes: Array[Byte]): FlacMeta = {
    val none = FlacMeta("not_flac", None, None, None, None, 0, Map.empty)
    if (bytes.length < Magic.length) return none
    var k = 0
    while (k < Magic.length) {
      if (bytes(k) != Magic(k)) return none
      k += 1
    }
    var off = Magic.length
    var sampleRate, channels, bps = Option.empty[Int]
    var totalSamples = Option.empty[Long]
    var comments = Map.empty[String, String]
    var nBlocks = 0
    var status = "ok"
    var last = false
    var first = true
    while (!last && status == "ok" && nBlocks < MaxBlocks) {
      if (off + 4 > bytes.length) { status = "truncated" }
      else {
        val h = bytes(off) & 0xFF
        last = (h & 0x80) != 0
        val typ = h & 0x7F
        val len = u24be(bytes, off + 1)
        val body = off + 4
        if (body + len > bytes.length) { status = "truncated" }
        else {
          if (first) {
            if (typ != 0 || len != 34)
              return FlacMeta("no_streaminfo", None, None, None, None,
                nBlocks, Map.empty)
            // bit-packed stream facts at body+10 (after the four
            // block/frame-size fields)
            val p = body + 10
            val rate = ((bytes(p) & 0xFF) << 12) |
              ((bytes(p + 1) & 0xFF) << 4) | ((bytes(p + 2) & 0xFF) >>> 4)
            val ch = (((bytes(p + 2) & 0xFF) >>> 1) & 0x7) + 1
            val bits = ((((bytes(p + 2) & 0xFF) & 1) << 4) |
              ((bytes(p + 3) & 0xFF) >>> 4)) + 1
            val ts = (((bytes(p + 3) & 0xFFL) & 0xF) << 32) |
              ((bytes(p + 4) & 0xFFL) << 24) | ((bytes(p + 5) & 0xFFL) << 16) |
              ((bytes(p + 6) & 0xFFL) << 8) | (bytes(p + 7) & 0xFFL)
            sampleRate = Some(rate); channels = Some(ch)
            bps = Some(bits); totalSamples = Some(ts)
            first = false
          } else if (typ == 4) {
            // VORBIS_COMMENT: little-endian lengths inside a
            // big-endian container
            var q = body
            val end = body + len
            if (q + 4 <= end) {
              val vlen = u32le(bytes, q); q += 4
              if (vlen >= 0 && q + vlen <= end) {
                q += vlen.toInt
                if (q + 4 <= end) {
                  val n = u32le(bytes, q); q += 4
                  var i = 0L
                  var ok = true
                  while (ok && i < n && i < MaxComments) {
                    if (q + 4 > end) ok = false
                    else {
                      val clen = u32le(bytes, q); q += 4
                      if (clen < 0 || q + clen > end) ok = false
                      else {
                        val s = new String(bytes, q, clen.toInt, UTF_8)
                        q += clen.toInt
                        val eq = s.indexOf('=')
                        if (eq > 0)
                          comments += (s.substring(0, eq).toUpperCase ->
                            s.substring(eq + 1))
                        i += 1
                      }
                    }
                  }
                }
              }
            }
          } // other types (PADDING, unknown): skipped by length
          nBlocks += 1
          off = body + len
        }
      }
    }
    if (first && status == "ok")
      FlacMeta("no_streaminfo", None, None, None, None, nBlocks, Map.empty)
    else FlacMeta(status, sampleRate, channels, bps, totalSamples,
      nBlocks, comments)
  }

  /** Writer half: a conforming metadata prologue (no audio frames —
    * the walk under test stops at the last metadata block anyway).
    * MD5 is zeroed: it digests the DECODED pcm, which this
    * environment can't produce (documented stub, the [[Media]]
    * discipline — the container walk stays real). */
  def write(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long,
      comments: Seq[(String, String)],
      padding: Option[Int] = None): Array[Byte] = {
    require(sampleRate < (1 << 20) && channels >= 1 && channels <= 8 &&
      bitsPerSample >= 4 && bitsPerSample <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36),
      "streaminfo field out of range")
    require(padding.isEmpty || comments.nonEmpty,
      "padding is written non-last; a comments block must follow")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val hasMore = comments.nonEmpty || padding.nonEmpty
    // STREAMINFO
    val si = new Array[Byte](34)
    // plausible fixed block/frame sizes (decoders only need them
    // consistent): blocksize 4096/4096, framesize 0 (unknown)
    si(0) = 0x10; si(1) = 0x00; si(2) = 0x10; si(3) = 0x00
    val p = 10
    si(p) = ((sampleRate >>> 12) & 0xFF).toByte
    si(p + 1) = ((sampleRate >>> 4) & 0xFF).toByte
    si(p + 2) = (((sampleRate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >>> 4) & 1)).toByte
    si(p + 3) = ((((bitsPerSample - 1) & 0xF) << 4) |
      ((totalSamples >>> 32) & 0xF).toInt).toByte
    si(p + 4) = ((totalSamples >>> 24) & 0xFF).toByte
    si(p + 5) = ((totalSamples >>> 16) & 0xFF).toByte
    si(p + 6) = ((totalSamples >>> 8) & 0xFF).toByte
    si(p + 7) = (totalSamples & 0xFF).toByte
    out.write((if (hasMore) 0x00 else 0x80)) // type 0, last flag
    out.write(Array[Byte](0, 0, 34))
    out.write(si)
    padding.foreach { n =>
      out.write(0x01) // PADDING, never last here (comments follow)
      out.write(Array[Byte](((n >> 16) & 0xFF).toByte,
        ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte))
      out.write(new Array[Byte](n))
    }
    if (comments.nonEmpty) {
      val body = new java.io.ByteArrayOutputStream()
      val vendor = "graft".getBytes(UTF_8)
      def le32(v: Int): Array[Byte] = Array[Byte](
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      body.write(le32(vendor.length)); body.write(vendor)
      body.write(le32(comments.length))
      comments.foreach { case (k, v) =>
        val c = s"$k=$v".getBytes(UTF_8)
        body.write(le32(c.length)); body.write(c)
      }
      val b = body.toByteArray
      out.write(0x80 | 0x04) // VORBIS_COMMENT, last
      out.write(Array[Byte](((b.length >> 16) & 0xFF).toByte,
        ((b.length >> 8) & 0xFF).toByte, (b.length & 0xFF).toByte))
      out.write(b)
    }
    out.toByteArray
  }
}
