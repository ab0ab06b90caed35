package graft.multimodal

import java.util.zip.CRC32

/** PNG (ISO 15948) container walk — the image sibling of [[Mp4]]'s
  * ISO-BMFF walker and [[Wav]]'s RIFF walker: where [[ImageCodec]]
  * DECODES pixels through `javax.imageio`, this reads the container
  * STRUCTURE the decoder hides — the chunk table (length / type /
  * CRC-32 framing), the IHDR scalars (width, height, bit depth,
  * color type, interlace), and the `tEXt` metadata chunks a crawl's
  * sidecar annotations ride in. A 100 TB image corpus triages on
  * exactly these facts (dimensions, bad-CRC corruption, truncation,
  * embedded provenance text) WITHOUT paying a pixel decode.
  *
  * Hostile-input discipline of the walker family (Exif/Mp4/Vtt):
  * a wrong signature, a chunk length past the buffer, or a missing
  * IHDR classifies the payload instead of throwing; per-chunk CRC
  * mismatches are COUNTED and the walk continues (ancillary
  * corruption must not hide the rest of the table); the chunk count
  * is capped so a crafted length pattern can't spin the walk.
  */
object Png {

  /** PNG 8-byte signature. */
  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Hostile-input cap: more chunks than this and the walk stops
    * (a real PNG of test-card size has < 10). */
  val MaxChunks = 4096

  /** One walked chunk: type fourcc, payload length, CRC validity. */
  final case class ChunkInfo(typ: String, length: Int, crcOk: Boolean)

  /** The walk's result. `status` ∈ ok | not_png | no_ihdr |
    * truncated; IHDR scalars are None unless an intact IHDR payload
    * was read (its CRC may still be bad — that lands in
    * `badCrcCount`, not in the scalars: the bytes are there either
    * way and corruption triage wants BOTH facts). `trailing` counts
    * bytes past IEND's CRC (0 for a conforming file): a concatenated
    * or garbage-padded payload still walks `ok` — the table IS intact
    * — but the writer half must splice from the WALKED IEND offset,
    * never from `length - 12`. */
  final case class PngMeta(
      status: String,
      width: Option[Int],
      height: Option[Int],
      bitDepth: Option[Int],
      colorType: Option[Int],
      interlace: Option[Int],
      chunks: Vector[ChunkInfo],
      texts: Vector[(String, String)],
      trailing: Int = 0) {
    def badCrcCount: Int = chunks.count(!_.crcOk)
    def sawIend: Boolean = chunks.lastOption.exists(_.typ == "IEND")
  }

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new CRC32
    c.update(b, off, len)
    c.getValue
  }

  /** Walk the chunk table. Never throws on hostile bytes. */
  def parse(bytes: Array[Byte]): PngMeta = {
    val none = PngMeta("not_png", None, None, None, None, None,
      Vector.empty, Vector.empty)
    if (bytes.length < Signature.length) return none
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return none
      i += 1
    }
    var off = Signature.length
    val chunks = Vector.newBuilder[ChunkInfo]
    val texts = Vector.newBuilder[(String, String)]
    var width, height, bitDepth, colorType, interlace = Option.empty[Int]
    var status = "ok"
    var first = true
    var n = 0
    var done = false
    var trailing = 0
    while (!done) {
      if (off == bytes.length) {
        done = true // clean end (a conforming file ends AT IEND's crc)
      } else if (off + 8 > bytes.length) {
        status = "truncated"; done = true
      } else {
        val len = u32(bytes, off)
        val typ = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (!typ.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) {
          status = "truncated"; done = true // framing lost — not a chunk type
        } else if (len > Int.MaxValue - 12 || off + 12 + len > bytes.length) {
          status = "truncated"; done = true
        } else {
          val dataOff = off + 8
          val want = u32(bytes, dataOff + len.toInt)
          val got = crc32(bytes, off + 4, 4 + len.toInt)
          chunks += ChunkInfo(typ, len.toInt, want == got)
          if (first) {
            if (typ != "IHDR" || len != 13) {
              return PngMeta("no_ihdr", None, None, None, None, None,
                chunks.result(), Vector.empty)
            }
            width = Some(u32(bytes, dataOff).toInt)
            height = Some(u32(bytes, dataOff + 4).toInt)
            bitDepth = Some(bytes(dataOff + 8) & 0xFF)
            colorType = Some(bytes(dataOff + 9) & 0xFF)
            interlace = Some(bytes(dataOff + 12) & 0xFF)
            first = false
          } else if (typ == "tEXt") {
            // keyword NUL text, both Latin-1 per spec
            val data = bytes.slice(dataOff, dataOff + len.toInt)
            val nul = data.indexOf(0.toByte)
            if (nul > 0) {
              texts += ((new String(data, 0, nul, "ISO-8859-1"),
                new String(data, nul + 1, data.length - nul - 1, "ISO-8859-1")))
            }
          }
          n += 1
          off = dataOff + len.toInt + 4
          if (typ == "IEND") {
            // bytes past IEND's CRC are trailing garbage, not chunks
            trailing = bytes.length - off
            done = true
          } else if (n >= MaxChunks) done = true
        }
      }
    }
    // framing lost before IHDR was ever established is `truncated`
    // (we can't say whether an IHDR exists past the cut); a CLEANLY
    // walked table that simply never had an IHDR is `no_ihdr`
    if (first && status == "ok")
      PngMeta("no_ihdr", None, None, None, None, None,
        chunks.result(), texts.result(), trailing)
    else PngMeta(status, width, height, bitDepth, colorType, interlace,
      chunks.result(), texts.result(), trailing)
  }

  /** Insert a `tEXt` chunk (keyword NUL value, CRC computed here)
    * immediately before IEND — the WRITER half that makes the
    * gate's metadata read load-bearing: the walker must find a chunk
    * this code framed, not one the encoder happened to emit. */
  def insertText(bytes: Array[Byte], keyword: String, value: String): Array[Byte] = {
    val meta = parse(bytes)
    require(meta.status == "ok" && meta.sawIend,
      s"insertText needs an intact png, got ${meta.status}")
    // IEND's offset comes from the WALK, not from `length - 12`: a
    // payload with trailing bytes after IEND still parses ok, and
    // splicing at a fixed tail offset would corrupt it (r10 advice)
    val iendOff = bytes.length - meta.trailing - 12
    val kw = keyword.getBytes("ISO-8859-1")
    val tv = value.getBytes("ISO-8859-1")
    val data = kw ++ Array(0.toByte) ++ tv
    val out = new java.io.ByteArrayOutputStream(bytes.length + data.length + 12)
    out.write(bytes, 0, iendOff)
    val lenBuf = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(lenBuf)
    val typAndData = "tEXt".getBytes("US-ASCII") ++ data
    out.write(typAndData)
    val crcBuf = java.nio.ByteBuffer.allocate(4)
      .putInt(crc32(typAndData, 0, typAndData.length).toInt).array()
    out.write(crcBuf)
    // IEND plus any trailing bytes, carried through unchanged
    out.write(bytes, iendOff, bytes.length - iendOff)
    out.toByteArray
  }
}
