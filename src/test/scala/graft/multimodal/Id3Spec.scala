package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The ID3v2 walker against syncsafe sizes, the v2.3/v2.4 frame-size
  * split, multi-encoding text frames, and the walker family's
  * hostile inputs. */
class Id3Spec extends AnyFunSuite {

  test("v2.4 round trip: utf-8 title, latin-1 album, track, unknown frame counted") {
    val b = Id3.write(4, Seq(
      ("TIT2", 3, "T★42"), ("TALB", 0, "A42"), ("TRCK", 0, "7")),
      extra = Seq(("WXYZ", Array[Byte](1, 2, 3, 4, 5))))
    val m = Id3.parse(b)
    assert(m.status == "ok" && m.version.contains(4))
    assert(m.nFrames == 4)
    assert(m.title.contains("T★42"))
    assert(m.album.contains("A42"))
    assert(m.track.contains("7"))
  }

  test("v2.3 plain-BE frame sizes: a >127-byte frame parses; misreading it as v2.4 diverges") {
    val long = "A" + "z" * 140
    val b3 = Id3.write(3, Seq(("TALB", 0, long), ("TRCK", 0, "3")))
    val m3 = Id3.parse(b3)
    assert(m3.status == "ok" && m3.album.contains(long) && m3.track.contains("3"))
    // flip the version byte: the same bytes decoded with syncsafe
    // frame sizes mis-frame — the walk must NOT report both frames ok
    val b4 = b3.clone(); b4(3) = 4
    val m4 = Id3.parse(b4)
    assert(!(m4.status == "ok" && m4.nFrames == 2 && m4.album.contains(long)),
      "the v2.3/v2.4 size split must be load-bearing")
  }

  test("utf-16 with BOM decodes in both byte orders") {
    val le = Id3.write(3, Seq(("TIT2", 1, "Té9")))
    assert(Id3.parse(le).title.contains("Té9"))
    // hand-craft a BE-BOM body via the extra-frame door
    val beBody = Array(1.toByte, 0xFE.toByte, 0xFF.toByte) ++
      "Té9".getBytes("UTF-16BE")
    val be = Id3.write(3, Seq.empty, extra = Seq(("TIT2", beBody)))
    assert(Id3.parse(be).title.contains("Té9"))
    // enc-1 without a BOM is malformed: no value, frame still counted
    val noBom = Id3.write(3, Seq.empty,
      extra = Seq(("TIT2", Array(1.toByte) ++ "x".getBytes("UTF-16LE"))))
    val m = Id3.parse(noBom)
    assert(m.title.isEmpty && m.nFrames == 1)
  }

  test("v2.4 data-length indicator (0x01) prefix is skipped; compressed " +
      "frames are counted but opaque (r11 advice)") {
    def ss(n: Int) = Array(((n >> 21) & 0x7F).toByte, ((n >> 14) & 0x7F).toByte,
      ((n >> 7) & 0x7F).toByte, (n & 0x7F).toByte)
    val body = Array(0.toByte) ++ "DLIT".getBytes("ISO-8859-1")
    val frame = "TIT2".getBytes("ISO-8859-1") ++ ss(4 + body.length) ++
      Array(0.toByte, 0x01.toByte) ++ ss(body.length) ++ body
    // a compressed TALB (0x08, DLI set as the spec requires): without
    // a codec the walker must count it, never misread zlib bytes as
    // a text encoding
    val cbody = Array[Byte](0x78, 0x9C.toByte, 1, 2, 3)
    val cframe = "TALB".getBytes("ISO-8859-1") ++ ss(4 + cbody.length) ++
      Array(0.toByte, 0x09.toByte) ++ ss(99) ++ cbody
    val tagBody = frame ++ cframe
    val tag = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](4, 0, 0) ++
      ss(tagBody.length) ++ tagBody
    val m = Id3.parse(tag)
    assert(m.status == "ok" && m.nFrames == 2, s"got $m")
    assert(m.title.contains("DLIT"),
      s"the 4-byte DLI must be skipped before text decode: $m")
    assert(m.album.isEmpty, "compressed frame must be opaque, not misdecoded")
  }

  test("missing magic, unsupported version, short input classify no_tag") {
    assert(Id3.parse(Array.emptyByteArray).status == "no_tag")
    assert(Id3.parse("MP3 data without a tag".getBytes).status == "no_tag")
    val v5 = Id3.write(4, Seq(("TIT2", 0, "x"))).clone()
    v5(3) = 5
    assert(Id3.parse(v5).status == "no_tag")
  }

  test("truncation keeps the frames already walked") {
    val b = Id3.write(4, Seq(
      ("TIT2", 0, "T1"), ("TALB", 0, "A1"), ("TRCK", 0, "9")))
    val cut = Id3.parse(b.dropRight(6)) // lands inside TRCK
    assert(cut.status == "truncated")
    assert(cut.title.contains("T1") && cut.album.contains("A1"))
    assert(cut.track.isEmpty && cut.nFrames == 2)
    // a frame whose size field points past the declared extent
    val bad = b.clone()
    bad(14) = 0x7F // TIT2 frame size -> huge (syncsafe high byte)
    assert(Id3.parse(bad).status == "truncated")
  }

  test("padding ends the walk without inventing frames") {
    val b = Id3.write(4, Seq(("TIT2", 0, "T2")), padding = 64)
    val m = Id3.parse(b)
    assert(m.status == "ok" && m.nFrames == 1 && m.title.contains("T2"))
  }

  test("non-alphanumeric frame id bytes mean lost framing: truncated") {
    val good = Id3.write(4, Seq(("TIT2", 0, "T3")))
    val bad = good.clone()
    bad(11) = 0x01 // corrupt a frame-id byte (non-zero, non-alnum)
    assert(Id3.parse(bad).status == "truncated")
  }

  test("extended header is skipped by its version-correct size (r10 advice)") {
    // v2.4: syncsafe self-inclusive; v2.3: plain-BE self-exclusive
    for (major <- Seq(3, 4)) {
      val b = Id3.write(major, Seq(("TIT2", 0, "ExtOk"), ("TALB", 0, "A")),
        extendedHeader = true)
      val m = Id3.parse(b)
      assert(m.status == "ok", s"v2.$major: ${m.status}")
      assert(m.nFrames == 2 && m.title.contains("ExtOk") && m.album.contains("A"),
        s"v2.$major: $m")
    }
  }

  test("v2.3 whole-tag unsynchronisation de-unsyncs before the walk") {
    // 0xFF bytes in a latin-1 value force real FF->FF00 expansion
    val hot = "a\u00ffb\u00ffc"
    val b = Id3.write(3, Seq(("TIT2", 0, hot), ("TRCK", 0, "9")),
      unsynchronised = true)
    // the on-disk tag really is unsynced: raw buffer contains FF 00
    assert(b.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && p(1) == 0))
    val m = Id3.parse(b)
    assert(m.status == "ok" && m.nFrames == 2)
    assert(m.title.contains(hot) && m.track.contains("9"))
  }

  test("v2.4 per-frame unsynchronisation: flagged bodies de-unsync, sizes are on-disk") {
    val hot = "x\u00ffy"
    val b = Id3.write(4, Seq(("TIT2", 0, hot), ("TALB", 0, "plain")),
      unsynchronised = true)
    val m = Id3.parse(b)
    assert(m.status == "ok" && m.nFrames == 2)
    assert(m.title.contains(hot) && m.album.contains("plain"))
  }
}
