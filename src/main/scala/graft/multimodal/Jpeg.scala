package graft.multimodal

/** JPEG/JFIF (ITU T.81 + JFIF 1.02) segment walk — the crawl-web
  * image triage next to [[Png]]'s chunk walk: JPEG is the dominant
  * byte format of any web image corpus, and everything a pipeline
  * triages on — dimensions, component count, baseline-vs-progressive
  * (decode cost class), JFIF/Exif presence, truncation — lives in
  * the marker segments BEFORE the entropy-coded data, so the walk
  * never pays a pixel decode.
  *
  * Format facts the walker makes load-bearing:
  *  - segments are `FF <marker> <len₁₆ incl itself>`; standalone
  *    markers (SOI, EOI, TEM, RST0-7) carry NO length field — a
  *    reader that assumes one desyncs;
  *  - any number of FF FILL bytes may precede a marker (T.81 §B.1.1.2);
  *  - SOF0/SOF2 carry precision, height, width, component count
  *    (SOF2 = progressive — the "must buffer whole image" class);
  *  - entropy data after SOS hides FF bytes behind 00 STUFFING, and
  *    RST0-7 markers appear inside it — the scan to the next true
  *    marker must skip both or it splits the stream early.
  *
  * Hostile-input discipline of the walker family (Png/Exif/Mp4):
  * wrong SOI, a length past the buffer, or missing EOI classifies
  * the payload instead of throwing; the segment count is capped so a
  * crafted length pattern can't spin the walk; bytes past EOI are
  * COUNTED (`trailing`) — a concatenated or padded payload still
  * walks `ok`.
  */
object Jpeg {

  /** Hostile-input cap: segments walked before the walk stops. */
  val MaxSegments = 4096

  /** The walk's result. `status` ∈ ok | not_jpeg | truncated.
    * SOF scalars survive a later truncation (the bytes were there —
    * FLAC discipline); `progressive` is SOF2-vs-SOF0; `comment` is
    * the first COM segment's text. */
  final case class JpegMeta(
      status: String,
      width: Option[Int],
      height: Option[Int],
      precision: Option[Int],
      nComponents: Option[Int],
      progressive: Option[Boolean],
      jfifVersion: Option[String],
      hasExif: Boolean,
      comment: Option[String],
      sawEoi: Boolean,
      trailing: Int)

  private val none = JpegMeta(
    "not_jpeg", None, None, None, None, None, None, false, None, false, 0)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** Walk the marker segments of `bytes`. Never throws. */
  def parse(bytes: Array[Byte]): JpegMeta = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
        (bytes(1) & 0xFF) != 0xD8) return none
    var i = 2
    var segs = 0
    var width, height, precision, nComp = Option.empty[Int]
    var progressive = Option.empty[Boolean]
    var jfif = Option.empty[String]
    var exif = false
    var comment = Option.empty[String]
    var sawEoi = false
    var trailing = 0
    var status = "ok"
    var done = false
    while (!done && segs < MaxSegments) {
      // fill bytes: any run of FF before the marker id (§B.1.1.2)
      while (i + 1 < bytes.length && (bytes(i) & 0xFF) == 0xFF &&
             (bytes(i + 1) & 0xFF) == 0xFF) i += 1
      if (i + 2 > bytes.length) { status = "truncated"; done = true }
      else if ((bytes(i) & 0xFF) != 0xFF) { status = "truncated"; done = true }
      else {
        val m = bytes(i + 1) & 0xFF
        segs += 1
        if (m == 0xD9) { // EOI
          sawEoi = true
          trailing = bytes.length - i - 2
          done = true
        } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
          i += 2 // standalone: no length field
        } else if (i + 4 > bytes.length) {
          status = "truncated"; done = true
        } else {
          val len = u16(bytes, i + 2)
          if (len < 2 || i + 2 + len > bytes.length) {
            status = "truncated"; done = true
          } else {
            m match {
              case 0xC0 | 0xC2 if len >= 8 => // SOF0 baseline / SOF2 progressive
                precision = Some(bytes(i + 4) & 0xFF)
                height = Some(u16(bytes, i + 5))
                width = Some(u16(bytes, i + 7))
                nComp = Some(bytes(i + 9) & 0xFF)
                progressive = Some(m == 0xC2)
              case 0xE0 if len >= 14 && // APP0 "JFIF\0"
                  new String(bytes, i + 4, 5, "ISO-8859-1") == "JFIF\u0000" =>
                jfif = Some(s"${bytes(i + 9) & 0xFF}.${bytes(i + 10) & 0xFF}")
              case 0xE1 if len >= 8 && // APP1 "Exif\0\0"
                  new String(bytes, i + 4, 6, "ISO-8859-1") == "Exif\u0000\u0000" =>
                exif = true
              case 0xFE if comment.isEmpty => // COM
                comment = Some(new String(bytes, i + 4, len - 2, "ISO-8859-1"))
              case _ => ()
            }
            i += 2 + len
            if (m == 0xDA) {
              // entropy-coded data: scan to the next TRUE marker —
              // FF 00 is a stuffed literal, FF D0-D7 a restart
              var j = i
              var found = false
              while (!found && j + 1 < bytes.length) {
                val nm = bytes(j + 1) & 0xFF
                if ((bytes(j) & 0xFF) == 0xFF && nm != 0x00 &&
                    (nm < 0xD0 || nm > 0xD7)) found = true
                else j += 1
              }
              if (!found) { status = "truncated"; done = true }
              else i = j
            }
          }
        }
      }
    }
    if (segs >= MaxSegments) status = "truncated"
    JpegMeta(status, width, height, precision, nComp, progressive,
      jfif, exif, comment, sawEoi, trailing)
  }

  /** Writer half: frame `text` as a COM segment and splice it right
    * after SOI (legal position; real taggers put provenance there). */
  def insertComment(jpeg: Array[Byte], text: String): Array[Byte] = {
    val t = text.getBytes("ISO-8859-1")
    val seg = Array[Byte](0xFF.toByte, 0xFE.toByte,
      (((t.length + 2) >> 8) & 0xFF).toByte, ((t.length + 2) & 0xFF).toByte) ++ t
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Writer half: a minimal APP1 Exif stub (identifier + TIFF
    * header) spliced after SOI — enough for presence triage, which
    * is what `hasExif` claims. */
  def insertExifStub(jpeg: Array[Byte]): Array[Byte] = {
    val body = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++
      Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0)
    val seg = Array[Byte](0xFF.toByte, 0xE1.toByte,
      (((body.length + 2) >> 8) & 0xFF).toByte,
      ((body.length + 2) & 0xFF).toByte) ++ body
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }
}
