package graft.multimodal

/** GIF (87a/89a) block walk — the third web-image triage next to
  * [[Jpeg]] and [[Png]]: GIF is the animation/sticker format of any
  * crawl, and its triage facts are STRUCTURAL — frame count (static
  * vs animated is a pipeline routing decision), interlacing, palette
  * presence, Graphic Control Extension timing/transparency, comment
  * provenance — all readable from block framing without LZW decode.
  *
  * Format facts the walker makes load-bearing:
  *  - after the logical screen descriptor, the file is a SEQUENCE of
  *    blocks: extensions (0x21 label, then a SUB-BLOCK CHAIN — each
  *    sub-block is len+data, terminated by a 0 byte), image
  *    descriptors (0x2C, optional local color table, LZW min-code
  *    byte, then another sub-block chain), and the 0x3B trailer;
  *  - every length is a U8/U16LE — unknown extension labels must be
  *    skipped by their CHAIN, not by a guessed size;
  *  - the Graphic Control Extension (label 0xF9) carries frame delay
  *    (centiseconds) and the transparency flag — the animation facts.
  *
  * Hostile discipline of the walker family: wrong signature, a
  * sub-block running past the buffer, or a missing trailer classify
  * instead of throwing; block count capped; bytes past the trailer
  * COUNTED (`trailing`). */
object Gif {

  val MaxBlocks = 4096

  /** `status` ∈ ok | not_gif | truncated. Screen scalars survive a
    * later truncation (the bytes were there). */
  final case class GifMeta(
      status: String,
      version: Option[String],
      width: Option[Int],
      height: Option[Int],
      hasGct: Boolean,
      interlaced: Boolean,
      nFrames: Int,
      delayCs: Option[Int],
      transparent: Boolean,
      comment: Option[String],
      sawTrailer: Boolean,
      trailing: Int)

  private val none = GifMeta(
    "not_gif", None, None, None, false, false, 0, None, false, None,
    false, 0)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Skip a sub-block chain starting at `i`; returns the offset past
    * the 0 terminator, or -1 when the chain runs off the buffer. */
  private def skipChain(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i < b.length && b(i) != 0) {
      i += 1 + (b(i) & 0xFF)
    }
    if (i >= b.length) -1 else i + 1
  }

  /** Read a sub-block chain's concatenated payload (for COM). */
  private def readChain(b: Array[Byte], start: Int): Option[(String, Int)] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = start
    while (i < b.length && b(i) != 0) {
      val n = b(i) & 0xFF
      if (i + 1 + n > b.length) return None
      out.write(b, i + 1, n)
      i += 1 + n
    }
    if (i >= b.length) None
    else Some((new String(out.toByteArray, "ISO-8859-1"), i + 1))
  }

  /** Walk the blocks of `bytes`. Never throws. */
  def parse(bytes: Array[Byte]): GifMeta = {
    if (bytes.length < 13 || bytes(0) != 'G' || bytes(1) != 'I' ||
        bytes(2) != 'F') return none
    val version = new String(bytes, 3, 3, "ISO-8859-1")
    if (version != "87a" && version != "89a") return none
    val width = u16le(bytes, 6)
    val height = u16le(bytes, 8)
    val packed = bytes(10) & 0xFF
    val hasGct = (packed & 0x80) != 0
    var i = 13 + (if (hasGct) 3 * (2 << (packed & 7)) else 0)
    var frames = 0
    var interlaced = false
    var delay = Option.empty[Int]
    var transparent = false
    var comment = Option.empty[String]
    var sawTrailer = false
    var trailing = 0
    var status = "ok"
    var blocks = 0
    var done = false
    if (i > bytes.length) { status = "truncated"; done = true }
    while (!done && blocks < MaxBlocks) {
      if (i >= bytes.length) { status = "truncated"; done = true }
      else {
        blocks += 1
        (bytes(i) & 0xFF) match {
          case 0x3B =>
            sawTrailer = true
            trailing = bytes.length - i - 1
            done = true
          case 0x21 if i + 2 <= bytes.length =>
            val label = bytes(i + 1) & 0xFF
            label match {
              case 0xF9 if i + 7 <= bytes.length => // GCE: fixed 4-byte body
                transparent = transparent || (bytes(i + 3) & 0x01) != 0
                if (delay.isEmpty) delay = Some(u16le(bytes, i + 4))
              case 0xFE if comment.isEmpty => // COM
                readChain(bytes, i + 2) match {
                  case Some((text, _)) => comment = Some(text)
                  case None            => ()
                }
              case _ => ()
            }
            val next = skipChain(bytes, i + 2)
            if (next < 0) { status = "truncated"; done = true } else i = next
          case 0x2C if i + 10 <= bytes.length => // image descriptor
            frames += 1
            val ip = bytes(i + 9) & 0xFF
            interlaced = interlaced || (ip & 0x40) != 0
            var j = i + 10 + (if ((ip & 0x80) != 0) 3 * (2 << (ip & 7)) else 0)
            j += 1 // LZW minimum code size byte
            if (j > bytes.length) { status = "truncated"; done = true }
            else {
              val next = skipChain(bytes, j)
              if (next < 0) { status = "truncated"; done = true } else i = next
            }
          case _ => status = "truncated"; done = true // framing lost
        }
      }
    }
    if (blocks >= MaxBlocks) status = "truncated"
    GifMeta(status, Some(version), Some(width), Some(height), hasGct,
      interlaced, frames, delay, transparent, comment, sawTrailer, trailing)
  }

  /** Writer half: frame `text` as a COMMENT extension (0x21 0xFE,
    * 255-byte sub-blocks) spliced right after the global color
    * table — a legal position real taggers use. */
  def insertComment(gif: Array[Byte], text: String): Array[Byte] = {
    val at = afterGct(gif)
    val t = text.getBytes("ISO-8859-1")
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(0x21); bo.write(0xFE)
    t.grouped(255).foreach { g => bo.write(g.length); bo.write(g, 0, g.length) }
    bo.write(0)
    gif.take(at) ++ bo.toByteArray ++ gif.drop(at)
  }

  /** Writer half: a Graphic Control Extension with `delayCs` and the
    * transparency flag — the animation-facts block. */
  def insertGce(gif: Array[Byte], delayCs: Int, transparent: Boolean): Array[Byte] = {
    val at = afterGct(gif)
    val gce = Array[Byte](0x21.toByte, 0xF9.toByte, 4,
      (if (transparent) 1 else 0).toByte,
      (delayCs & 0xFF).toByte, ((delayCs >> 8) & 0xFF).toByte, 0, 0)
    gif.take(at) ++ gce ++ gif.drop(at)
  }

  private def afterGct(gif: Array[Byte]): Int = {
    val packed = gif(10) & 0xFF
    13 + (if ((packed & 0x80) != 0) 3 * (2 << (packed & 7)) else 0)
  }
}
