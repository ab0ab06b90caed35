package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the JPEG/JFIF segment walker ([[Jpeg]]): real
  * `javax.imageio` encoder output parses to the pinned structure,
  * our writer-half splices verify, and the format's two desync
  * classes — lengthless standalone markers and FF fill bytes — plus
  * the entropy-scan hazards (FF00 stuffing, RST markers) are
  * handled. Hostile-byte never-throws lives in WalkerFuzzSpec. */
class JpegSpec extends AnyFunSuite {

  private def card(id: Long, w: Int, h: Int): Array[Byte] =
    ImageCodec.encode(ImageCodec.renderGray(id, w, h), "jpg")

  test("real encoder output: pinned JFIF/SOF structure") {
    val m = Jpeg.parse(card(7, 21, 15))
    assert(m.status == "ok")
    assert(m.width.contains(21) && m.height.contains(15))
    assert(m.precision.contains(8))
    assert(m.nComponents.contains(3), "JDK jpg writer emits 3-comp YCbCr")
    assert(m.progressive.contains(false), "baseline SOF0")
    assert(m.jfifVersion.contains("1.2"))
    assert(!m.hasExif && m.comment.isEmpty)
    assert(m.sawEoi && m.trailing == 0)
  }

  test("COM splice and Exif stub surface; trailing bytes counted, still ok") {
    val c = card(3, 10, 10)
    assert(Jpeg.parse(Jpeg.insertComment(c, "hello prov"))
      .comment.contains("hello prov"))
    assert(Jpeg.parse(Jpeg.insertExifStub(c)).hasExif)
    val padded = Jpeg.parse(c ++ Array.fill[Byte](5)(0x00))
    assert(padded.status == "ok" && padded.sawEoi && padded.trailing == 5)
  }

  test("mid-entropy truncation: SOF scalars survive, saw_eoi false") {
    val m = Jpeg.parse(card(9, 12, 8).dropRight(4))
    assert(m.status == "truncated" && !m.sawEoi)
    assert(m.width.contains(12) && m.height.contains(8))
  }

  test("broken SOI classifies not_jpeg with all scalars null") {
    val b = card(5, 9, 9); b(1) = 0x00
    val m = Jpeg.parse(b)
    assert(m.status == "not_jpeg" && m.width.isEmpty && !m.sawEoi)
  }

  test("fill bytes, stuffed FF00, and RST markers don't desync the walk") {
    // synthetic stream: SOI, fill-padded SOF0, SOS whose entropy data
    // contains FF00 stuffing and an RST2, then EOI
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        (((body.length + 2) >> 8) & 0xFF).toByte,
        ((body.length + 2) & 0xFF).toByte) ++ body
    val sof = seg(0xC0, Array[Byte](8, 0, 5, 0, 6, 1, 0x11, 0, 0))
    val sos = seg(0xDA, Array[Byte](1, 1, 0, 0, 63, 0))
    val entropy = Array[Byte](0x12, 0xFF.toByte, 0x00, 0x34,
      0xFF.toByte, 0xD2.toByte, 0x56) // stuffed FF + RST2 inside data
    val bytes = Array(0xFF.toByte, 0xD8.toByte) ++
      Array(0xFF.toByte, 0xFF.toByte) ++ sof ++ // leading fill byte
      sos ++ entropy ++ Array(0xFF.toByte, 0xD9.toByte)
    val m = Jpeg.parse(bytes)
    assert(m.status == "ok", m)
    assert(m.width.contains(6) && m.height.contains(5))
    assert(m.nComponents.contains(1) && m.sawEoi && m.trailing == 0)
  }

  test("SOF2 classifies progressive — the decode-cost split") {
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        (((body.length + 2) >> 8) & 0xFF).toByte,
        ((body.length + 2) & 0xFF).toByte) ++ body
    val sof2 = seg(0xC2, Array[Byte](8, 0, 4, 0, 4, 3, 0x11, 0, 0))
    val bytes = Array(0xFF.toByte, 0xD8.toByte) ++ sof2 ++
      Array(0xFF.toByte, 0xD9.toByte)
    assert(Jpeg.parse(bytes).progressive.contains(true))
  }
}
