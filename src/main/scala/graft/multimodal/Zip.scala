package graft.multimodal

/** ZIP central-directory walk — the ARCHIVE container of a crawl
  * (docx/xlsx/epub/apk/jar are all ZIPs; a corpus triage lists an
  * archive's entries long before it inflates any of them). The
  * format's defining property is that the TRUTH IS AT THE END: a
  * reader must find the End-Of-Central-Directory record by scanning
  * BACKWARD from EOF (the EOCD carries a variable-length trailing
  * comment, so its magic is not at a fixed offset), then jump to the
  * central directory and read the entry table from THERE — local
  * headers are allowed to lie (streaming writers patch sizes into
  * the central directory only). A reader that walks local headers
  * forward, or that assumes EOCD sits exactly 22 bytes from EOF,
  * silently mis-lists exactly the archives a crawl contains.
  *
  * Hostile-input discipline of the walker family (Png/Mp4/Warc):
  * missing EOCD, a central-directory offset or entry length past the
  * buffer, and a lying entry count all classify instead of throwing;
  * entry count is capped; the backward scan is bounded to the spec's
  * maximum comment length (65535 + 22).
  */
object Zip {

  val MaxEntries = 65536

  /** One central-directory entry. `method` 0 = stored, 8 = deflated. */
  final case class Entry(
      name: String, method: Int, compressedSize: Long,
      uncompressedSize: Long)

  /** The walk's result. `status` ∈ ok | no_eocd | truncated |
    * count_mismatch. `claimed` is the EOCD's entry count; `entries`
    * are the central-directory records actually walked. */
  final case class ZipMeta(
      status: String, claimed: Int, entries: Vector[Entry],
      comment: Option[String])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Find the EOCD record: backward scan from EOF, bounded by the
    * maximum comment length the 16-bit comment-length field allows. */
  private def findEocd(b: Array[Byte]): Int = {
    val lo = math.max(0, b.length - 22 - 65535)
    var i = b.length - 22
    while (i >= lo) {
      if (b(i) == 0x50 && b(i + 1) == 0x4B && b(i + 2) == 0x05 &&
          b(i + 3) == 0x06 &&
          // the comment-length field must agree with the actual tail
          // (defends against the magic appearing inside a comment)
          i + 22 + u16(b, i + 20) == b.length) return i
      i -= 1
    }
    -1
  }

  /** Walk the central directory. Never throws on hostile bytes. */
  def parse(bytes: Array[Byte]): ZipMeta = {
    if (bytes.length < 22)
      return ZipMeta("no_eocd", 0, Vector.empty, None)
    val eocd = findEocd(bytes)
    if (eocd < 0) return ZipMeta("no_eocd", 0, Vector.empty, None)
    val claimed = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16)
    val commentLen = u16(bytes, eocd + 20)
    val comment =
      if (commentLen == 0) None
      else Some(new String(bytes, eocd + 22, commentLen, "UTF-8"))
    if (cdOff > eocd)
      return ZipMeta("truncated", claimed, Vector.empty, comment)
    var off = cdOff.toInt
    val entries = Vector.newBuilder[Entry]
    var n = 0
    var status = "ok"
    var done = false
    while (!done && n < claimed && n < MaxEntries) {
      if (off + 46 > eocd ||
          !(bytes(off) == 0x50 && bytes(off + 1) == 0x4B &&
            bytes(off + 2) == 0x01 && bytes(off + 3) == 0x02)) {
        status = "count_mismatch" // table ended before the EOCD's claim
        done = true
      } else {
        val method = u16(bytes, off + 10)
        val csize = u32(bytes, off + 20)
        val usize = u32(bytes, off + 24)
        val nameLen = u16(bytes, off + 28)
        val extraLen = u16(bytes, off + 30)
        val cmtLen = u16(bytes, off + 32)
        if (off + 46 + nameLen + extraLen + cmtLen > eocd) {
          status = "truncated"
          done = true
        } else {
          val name = new String(bytes, off + 46, nameLen, "UTF-8")
          entries += Entry(name, method, csize, usize)
          n += 1
          off += 46 + nameLen + extraLen + cmtLen
        }
      }
    }
    ZipMeta(status, claimed, entries.result(), comment)
  }
}
