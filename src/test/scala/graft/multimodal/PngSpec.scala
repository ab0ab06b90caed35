package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The PNG chunk walker against real `javax.imageio`-encoded bytes
  * and the walker family's hostile inputs — one behavior per
  * assertion (the Exif/Mp4/Vtt discipline). */
class PngSpec extends AnyFunSuite {

  private def realPng(id: Long = 7L, w: Int = 12, h: Int = 9): Array[Byte] =
    ImageCodec.encode(ImageCodec.renderGray(id, w, h), "png")

  test("a real encoder's output walks clean: IHDR scalars, IEND, all CRCs good") {
    val m = Png.parse(realPng())
    assert(m.status == "ok")
    assert(m.width.contains(12) && m.height.contains(9))
    assert(m.bitDepth.contains(8), s"bit depth ${m.bitDepth}")
    assert(m.colorType.contains(2), s"color type ${m.colorType}") // truecolor
    assert(m.interlace.contains(0))
    assert(m.chunks.head.typ == "IHDR" && m.sawIend)
    assert(m.chunks.exists(_.typ == "IDAT"))
    assert(m.badCrcCount == 0)
    assert(m.texts.isEmpty)
  }

  test("insertText frames a tEXt chunk the walker finds, CRC-valid, before IEND") {
    val withText = Png.insertText(realPng(), "src", "doc42")
    val m = Png.parse(withText)
    assert(m.status == "ok" && m.badCrcCount == 0)
    assert(m.texts == Vector(("src", "doc42")))
    assert(m.chunks.map(_.typ).takeRight(2) == Vector("tEXt", "IEND"))
    // the original scalars are untouched by the insert
    assert(m.width.contains(12) && m.height.contains(9))
  }

  test("a flipped CRC byte is counted, not thrown on; the walk continues") {
    val b = realPng().clone()
    // IHDR chunk: sig(8) + len(4) + type(4) + data(13) + crc(4) — flip a crc byte
    b(8 + 4 + 4 + 13) = (b(8 + 4 + 4 + 13) ^ 0x5A).toByte
    val m = Png.parse(b)
    assert(m.status == "ok", "bad crc must not stop the walk")
    assert(m.badCrcCount == 1)
    assert(m.chunks.head.crcOk == false && m.sawIend)
    assert(m.width.contains(12), "scalars still read — the bytes are there")
  }

  test("truncation classifies: mid-IEND, mid-chunk-header, and a length past the buffer") {
    val b = realPng()
    val midIend = Png.parse(b.dropRight(7))
    assert(midIend.status == "truncated" && !midIend.sawIend)
    assert(midIend.width.contains(12), "IHDR read before the cut survives")
    val midHeader = Png.parse(b.take(8 + 4)) // half a chunk header
    assert(midHeader.status == "truncated")
    // craft a length field pointing past the end
    val crafted = b.clone()
    crafted(8) = 0x7F.toByte // IHDR len 13 -> huge
    assert(Png.parse(crafted).status == "truncated")
  }

  test("wrong signature and missing IHDR classify, never throw") {
    assert(Png.parse(Array.emptyByteArray).status == "not_png")
    assert(Png.parse("plainly not a png at all".getBytes).status == "not_png")
    val b = realPng().clone()
    b(0) = 0x00
    assert(Png.parse(b).status == "not_png")
    // valid signature, first chunk not IHDR: sig + a minimal IEND
    val iendOnly = Png.Signature ++
      Array[Byte](0, 0, 0, 0) ++ "IEND".getBytes("US-ASCII") ++
      Array[Byte](0xAE.toByte, 0x42, 0x60, 0x82.toByte)
    assert(Png.parse(iendOnly).status == "no_ihdr")
  }

  test("non-alpha chunk type bytes mean lost framing: truncated, walk stops") {
    val junk = Png.Signature ++ Array[Byte](0, 0, 0, 2) ++
      Array[Byte]('I', 'H', 0x01, 'R') ++ Array[Byte](1, 2, 0, 0, 0, 0)
    assert(Png.parse(junk).status == "truncated")
  }

  test("the chunk cap stops a crafted zero-advance pattern") {
    // many empty ancillary chunks; the cap must bound the walk
    val one = Array[Byte](0, 0, 0, 0) ++ "teXt".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) // wrong crc: fine, counted
    val ihdr = realPng().slice(8, 8 + 25)
    val flood = Png.Signature ++ ihdr ++
      Array.fill(Png.MaxChunks + 10)(one).flatten
    val m = Png.parse(flood)
    assert(m.chunks.size <= Png.MaxChunks)
  }

  test("trailing bytes after IEND are reported, and insertText splices at the walked IEND (r10 advice)") {
    val dirty = realPng() ++ "GARBAGE-AFTER-IEND".getBytes("US-ASCII")
    val m0 = Png.parse(dirty)
    assert(m0.status == "ok" && m0.sawIend && m0.trailing == 18)
    val withText = Png.insertText(dirty, "k", "v")
    val m = Png.parse(withText)
    assert(m.status == "ok" && m.badCrcCount == 0)
    assert(m.texts == Vector(("k", "v")))
    assert(m.chunks.map(_.typ).takeRight(2) == Vector("tEXt", "IEND"))
    // the trailing bytes ride through unchanged, still past IEND
    assert(m.trailing == 18)
    assert(new String(withText.takeRight(18), "US-ASCII") == "GARBAGE-AFTER-IEND")
  }

  test("a conforming file reports zero trailing bytes") {
    assert(Png.parse(realPng()).trailing == 0)
  }
}
