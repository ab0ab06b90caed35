package graft.multimodal

/** ID3v2 tag walk — the lossy-audio metadata sibling of [[Flac]]'s
  * block walk (MP3 carries no in-stream metadata; everything a
  * triage wants — title, album, track — rides an ID3v2 tag bolted on
  * the front). Two format quirks make this a REAL parser exercise,
  * and both are gate-load-bearing:
  *
  *   - SYNCSAFE integers: tag (and v2.4 frame) sizes store 7 bits
  *     per byte, MSB always 0, so the size field can never alias an
  *     MPEG frame sync (0xFF). A reader that decodes them as plain
  *     big-endian mis-frames every tag over 127 bytes.
  *   - the v2.3 / v2.4 SPLIT: frame sizes are plain 32-bit BE in
  *     v2.3 but syncsafe in v2.4 — the single most common ID3 parser
  *     bug in the wild. The gate plants a >127-byte frame so the two
  *     decodings genuinely diverge.
  *
  * Text frames (T***) carry an encoding byte: 0 = ISO-8859-1,
  * 1 = UTF-16 with BOM, 2 = UTF-16BE, 3 = UTF-8 — the fixture uses
  * 0, 1 and 3 so a parser that assumes one encoding corrupts a
  * value the oracle states. Hostile discipline: missing magic and
  * short headers classify `no_tag`; a declared tag extent or frame
  * size past the buffer classifies `truncated` while KEEPING the
  * frames already walked; zero-byte frame ids mean padding (walk
  * ends); frame count capped.
  */
object Id3 {

  val MaxFrames = 4096

  final case class Id3Meta(
      status: String, // ok | no_tag | truncated
      version: Option[Int],
      nFrames: Int,
      title: Option[String],
      album: Option[String],
      track: Option[String])

  private def syncsafe4(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7F) << 21) | ((b(o + 1) & 0x7F) << 14) |
      ((b(o + 2) & 0x7F) << 7) | (b(o + 3) & 0x7F)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def decodeText(body: Array[Byte]): Option[String] = {
    if (body.isEmpty) return None
    val enc = body(0) & 0xFF
    val t = body.drop(1)
    val s = enc match {
      case 0 => new String(t, "ISO-8859-1")
      case 1 => // UTF-16 with BOM; the BOM picks the order
        if (t.length >= 2 && (t(0) & 0xFF) == 0xFF && (t(1) & 0xFF) == 0xFE)
          new String(t.drop(2), "UTF-16LE")
        else if (t.length >= 2 && (t(0) & 0xFF) == 0xFE && (t(1) & 0xFF) == 0xFF)
          new String(t.drop(2), "UTF-16BE")
        else return None // enc-1 without a BOM is malformed
      case 2 => new String(t, "UTF-16BE")
      case 3 => new String(t, "UTF-8")
      case _ => return None
    }
    // text frames may carry a trailing NUL terminator
    Some(s.stripSuffix("\u0000"))
  }

  /** Remove the unsynchronisation scheme (ID3v2.4.0 §6.1): every
    * 0xFF 0x00 pair collapses to 0xFF. Inverse of [[unsync]]. */
  private def deUnsync(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if ((b(i) & 0xFF) == 0xFF && i + 1 < b.length && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  /** Apply the unsynchronisation scheme: a 0x00 is inserted after
    * every 0xFF (valid per spec — inserting after every FF is the
    * conservative writer form; readers must strip all FF 00). */
  private def unsync(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    b.foreach { x =>
      out.write(x)
      if ((x & 0xFF) == 0xFF) out.write(0)
    }
    out.toByteArray
  }

  /** Walk an ID3v2.3/2.4 tag at the head of `bytes`. Never throws.
    *
    * Header FLAGS (byte 5 — r10 advice: a real-world tag with the
    * extended-header or unsynchronisation bit set was mis-framed):
    *   - bit 6 (extended header): skipped by its declared size —
    *     syncsafe and self-inclusive in v2.4, plain-BE and
    *     self-EXCLUSIVE in v2.3 (the same split as frame sizes);
    *   - bit 7 (unsynchronisation): v2.3 applies the scheme to the
    *     whole tag, so the frame region is de-unsynced BEFORE the
    *     walk; v2.4's tag-level bit means every frame carries it, so
    *     each frame BODY de-unsyncs (sizes are on-disk sizes);
    *   - bit 4 (v2.4 footer): the declared size excludes it — no
    *     action needed;
    * v2.4 per-frame format flag 0x02 de-unsyncs that frame's body
    * even when the tag-level bit is clear. */
  def parse(bytes: Array[Byte]): Id3Meta = {
    val none = Id3Meta("no_tag", None, 0, None, None, None)
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
        bytes(2) != '3') return none
    val major = bytes(3) & 0xFF
    if (major != 3 && major != 4) return none
    val flags = bytes(5) & 0xFF
    val tagUnsync = (flags & 0x80) != 0
    val hasExt = (flags & 0x40) != 0
    val declared = 10 + syncsafe4(bytes, 6)
    var status = "ok"
    var end = declared
    if (declared > bytes.length) { status = "truncated"; end = bytes.length }
    var off = 10
    // v2.3 global unsync: de-unsync the whole frame region first —
    // the declared tag size counts the ON-DISK (unsynced) bytes, and
    // frame sizes inside refer to the de-unsynced stream
    var buf = bytes
    if (major == 3 && tagUnsync) {
      buf = bytes.take(10) ++ deUnsync(
        java.util.Arrays.copyOfRange(bytes, 10, end))
      end = buf.length
    }
    if (hasExt && off + 4 <= end) {
      // v2.4: syncsafe, includes the size field; v2.3: plain BE,
      // excludes it (header is size + 6 more bytes minimum)
      val skip =
        if (major == 4) syncsafe4(buf, off).toLong
        else u32be(buf, off) + 4L
      if (skip < (if (major == 4) 6 else 10) || off + skip > end) {
        status = "truncated"
        return Id3Meta(status, Some(major), 0, None, None, None)
      }
      off += skip.toInt
    }
    var n = 0
    var title, album, track = Option.empty[String]
    var done = false
    while (!done && off + 10 <= end && n < MaxFrames) {
      if (buf(off) == 0) done = true // padding
      else {
        val fid = new String(buf, off, 4, "ISO-8859-1")
        if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))) {
          status = "truncated"; done = true // framing lost
        } else {
          // THE split: v2.4 frame sizes are syncsafe, v2.3 plain BE
          val size =
            if (major == 4) syncsafe4(buf, off + 4).toLong
            else u32be(buf, off + 4)
          if (size < 0 || off + 10 + size > end) {
            status = "truncated"; done = true
          } else {
            // v2.4 frames unsync individually: the tag-level bit
            // means all of them, the format flag (0x02) one of them;
            // the stored size is the on-disk (synced) body size
            val fmt = buf(off + 9) & 0xFF
            val frameUnsync = major == 4 &&
              (tagUnsync || (fmt & 0x02) != 0)
            val raw = java.util.Arrays.copyOfRange(
              buf, off + 10, off + 10 + size.toInt)
            val unsynced = if (frameUnsync) deUnsync(raw) else raw
            // r11 advice: the format flags can PREPEND data to the
            // body — v2.4 a grouping byte (0x40) then a 4-byte
            // syncsafe data-length indicator (0x01, common alongside
            // unsync/compression); v2.3 a grouping byte (0x20).
            // Without the skip the first body bytes are misread as
            // text-encoding + text. Compressed/encrypted frames are
            // counted but treated as opaque (no codec to decode
            // them honestly): v2.4 flags 0x08/0x04, v2.3 0x80/0x40.
            var body = unsynced
            var decodable = true
            if (major == 4) {
              if ((fmt & 0x40) != 0)
                { if (body.length >= 1) body = body.drop(1) else decodable = false }
              if ((fmt & 0x01) != 0)
                { if (body.length >= 4) body = body.drop(4) else decodable = false }
              if ((fmt & 0x0C) != 0) decodable = false
            } else {
              if ((fmt & 0x20) != 0)
                { if (body.length >= 1) body = body.drop(1) else decodable = false }
              if ((fmt & 0xC0) != 0) decodable = false
            }
            if (decodable) fid match {
              case "TIT2" => title = decodeText(body)
              case "TALB" => album = decodeText(body)
              case "TRCK" => track = decodeText(body)
              case _ => () // unknown frames: skipped by size, counted
            }
            n += 1
            off += 10 + size.toInt
          }
        }
      }
    }
    Id3Meta(status, Some(major), n, title, album, track)
  }

  /** Writer half: an ID3v2.(3|4) tag with the given text frames
    * (each (id, encodingByte, text)) plus `extra` raw frames and
    * optional padding. Sizes are written in the VERSION'S encoding —
    * syncsafe for v2.4, plain BE for v2.3 — which is exactly what
    * makes the gate's >127-byte frame discriminating. */
  def write(major: Int, frames: Seq[(String, Int, String)],
      extra: Seq[(String, Array[Byte])] = Seq.empty,
      padding: Int = 0,
      extendedHeader: Boolean = false,
      unsynchronised: Boolean = false): Array[Byte] = {
    require(major == 3 || major == 4, "v2.3 or v2.4 only")
    def encodeBody(enc: Int, text: String): Array[Byte] = enc match {
      case 0 => Array(0.toByte) ++ text.getBytes("ISO-8859-1")
      case 1 => Array(1.toByte, 0xFF.toByte, 0xFE.toByte) ++
        text.getBytes("UTF-16LE")
      case 3 => Array(3.toByte) ++ text.getBytes("UTF-8")
      case _ => sys.error(s"unsupported encoding $enc")
    }
    def frameSize(sz: Int): Array[Byte] =
      if (major == 4) Array(
        ((sz >> 21) & 0x7F).toByte, ((sz >> 14) & 0x7F).toByte,
        ((sz >> 7) & 0x7F).toByte, (sz & 0x7F).toByte)
      else Array(
        ((sz >> 24) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, (sz & 0xFF).toByte)
    val bodyOut = new java.io.ByteArrayOutputStream()
    if (extendedHeader) {
      // minimal extended header, version-correct framing: v2.4 —
      // syncsafe self-inclusive size 6, one flag byte of zeros;
      // v2.3 — plain-BE self-EXCLUSIVE size 6, flags + padding size
      if (major == 4) bodyOut.write(Array[Byte](0, 0, 0, 6, 1, 0))
      else bodyOut.write(Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0))
    }
    val all = frames.map { case (fid, enc, text) =>
      (fid, encodeBody(enc, text))
    } ++ extra
    all.foreach { case (fid, body) =>
      // v2.4 unsync rides per frame (on-disk size, flag 0x02 set);
      // v2.3 unsync is applied to the whole tag after composition
      val onDisk =
        if (major == 4 && unsynchronised) unsync(body) else body
      bodyOut.write(fid.getBytes("ISO-8859-1"))
      bodyOut.write(frameSize(onDisk.length))
      bodyOut.write(Array[Byte](0,
        if (major == 4 && unsynchronised) 0x02.toByte else 0))
      bodyOut.write(onDisk)
    }
    if (padding > 0) bodyOut.write(new Array[Byte](padding))
    val body0 = bodyOut.toByteArray
    val body =
      if (major == 3 && unsynchronised) unsync(body0) else body0
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("ISO-8859-1"))
    val flags = ((if (unsynchronised) 0x80 else 0) |
      (if (extendedHeader) 0x40 else 0)).toByte
    out.write(Array[Byte](major.toByte, 0, flags))
    val sz = body.length
    out.write(Array(
      ((sz >> 21) & 0x7F).toByte, ((sz >> 14) & 0x7F).toByte,
      ((sz >> 7) & 0x7F).toByte, (sz & 0x7F).toByte))
    out.write(body)
    out.toByteArray
  }
}
