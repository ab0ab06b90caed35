package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the GIF block walker ([[Gif]]): real `javax.imageio`
  * encoder output parses to the pinned structure, the writer-half
  * splices verify, and the sub-block-chain hazards are handled.
  * Hostile-byte never-throws lives in WalkerFuzzSpec. */
class GifSpec extends AnyFunSuite {

  private def card(id: Long, w: Int, h: Int): Array[Byte] =
    ImageCodec.encode(ImageCodec.renderGray(id, w, h), "gif")

  test("real encoder output: pinned 89a/GCT/interlace structure") {
    val m = Gif.parse(card(7, 21, 15))
    assert(m.status == "ok")
    assert(m.version.contains("89a"))
    assert(m.width.contains(21) && m.height.contains(15))
    assert(m.hasGct, "JDK gif writer emits a global color table")
    assert(m.interlaced, "JDK gif writer interlaces")
    assert(m.nFrames == 1 && m.delayCs.isEmpty && !m.transparent)
    assert(m.sawTrailer && m.trailing == 0 && m.comment.isEmpty)
  }

  test("COM splice (incl. multi-sub-block) and GCE splice surface") {
    val c = card(3, 10, 10)
    val long = "x" * 600 // forces three 255/255/90 sub-blocks
    assert(Gif.parse(Gif.insertComment(c, long)).comment.contains(long))
    val g = Gif.parse(Gif.insertGce(c, 37, transparent = true))
    assert(g.delayCs.contains(37) && g.transparent && g.status == "ok")
  }

  test("mid-chain truncation: screen scalars and frame count survive") {
    val m = Gif.parse(card(9, 12, 8).dropRight(5))
    assert(m.status == "truncated" && !m.sawTrailer)
    assert(m.width.contains(12) && m.height.contains(8) && m.nFrames == 1)
  }

  test("broken signature classifies not_gif; trailing bytes counted ok") {
    val c = card(5, 9, 9)
    val b = c.clone(); b(2) = 'X'
    assert(Gif.parse(b).status == "not_gif")
    val t = Gif.parse(c ++ Array.fill[Byte](4)(0x00))
    assert(t.status == "ok" && t.sawTrailer && t.trailing == 4)
  }

  test("unknown extension labels are skipped by their sub-block chain") {
    val c = card(11, 8, 8)
    // splice an application extension (0xFF) with a 11-byte block +
    // one data sub-block — the walker must hop it by chain framing
    val at = 13 + 3 * (2 << (c(10) & 7)) // after header+LSD+GCT
    val app = Array[Byte](0x21.toByte, 0xFF.toByte, 11) ++
      "NETSCAPE2.0".getBytes("ISO-8859-1") ++
      Array[Byte](3, 1, 0, 0, 0)
    val m = Gif.parse(c.take(at) ++ app ++ c.drop(at))
    assert(m.status == "ok" && m.nFrames == 1 && m.sawTrailer, m)
  }
}
