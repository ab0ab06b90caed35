package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The FLAC metadata walker against the bit-packed STREAMINFO, the
  * little-endian-inside-big-endian VORBIS_COMMENT, and the walker
  * family's hostile inputs. */
class FlacSpec extends AnyFunSuite {

  test("write → parse round trip: every bit-packed field, both comments") {
    val b = Flac.write(44100, 2, 16, 123456789L,
      Seq("TITLE" -> "doc7", "LANG" -> "l3"))
    val m = Flac.parse(b)
    assert(m.status == "ok")
    assert(m.sampleRate.contains(44100))
    assert(m.channels.contains(2))
    assert(m.bitsPerSample.contains(16))
    assert(m.totalSamples.contains(123456789L))
    assert(m.durationMs.contains(123456789L * 1000 / 44100))
    assert(m.nBlocks == 2)
    assert(m.comments == Map("TITLE" -> "doc7", "LANG" -> "l3"))
  }

  test("field extremes survive the bit packing: 20-bit rate, 8 ch, 32 bps, 36-bit samples") {
    val b = Flac.write((1 << 20) - 1, 8, 32, (1L << 36) - 1, Seq.empty)
    val m = Flac.parse(b)
    assert(m.sampleRate.contains((1 << 20) - 1))
    assert(m.channels.contains(8))
    assert(m.bitsPerSample.contains(32))
    assert(m.totalSamples.contains((1L << 36) - 1))
    assert(m.nBlocks == 1, "streaminfo-only file carries the last flag")
  }

  test("a PADDING block between streaminfo and comments is skipped by length") {
    val b = Flac.write(16000, 1, 24, 999L, Seq("TITLE" -> "x"), padding = Some(10))
    val m = Flac.parse(b)
    assert(m.status == "ok" && m.nBlocks == 3)
    assert(m.comments == Map("TITLE" -> "x"))
  }

  test("missing magic and a non-leading STREAMINFO classify, never throw") {
    assert(Flac.parse(Array.emptyByteArray).status == "not_flac")
    assert(Flac.parse("OggS not flac".getBytes).status == "not_flac")
    // magic + a padding block first: the spec mandates STREAMINFO leads
    val bad = "fLaC".getBytes ++ Array[Byte](0x81.toByte, 0, 0, 2, 0, 0)
    assert(Flac.parse(bad).status == "no_streaminfo")
  }

  test("truncation classifies: mid-header, mid-streaminfo, and a length past the buffer") {
    val b = Flac.write(8000, 1, 16, 100L, Seq("TITLE" -> "t"))
    assert(Flac.parse(b.take(6)).status == "truncated") // mid block header
    val midSi = Flac.parse(b.take(4 + 4 + 17))
    assert(midSi.status == "truncated" && midSi.sampleRate.isEmpty)
    // a second block whose claimed length overruns the buffer: the
    // streaminfo fields already read must survive
    val over = b.take(4 + 4 + 34) ++ Array[Byte](0x04, 0x7F, 0x00, 0x00)
    val m = Flac.parse(over)
    assert(m.status == "truncated")
    assert(m.sampleRate.contains(8000) && m.nBlocks == 1)
  }

  test("comment payloads that lie about their lengths stop the comment walk cleanly") {
    val good = Flac.write(22050, 2, 16, 500L, Seq("TITLE" -> "ok"))
    // corrupt the first comment's u32le length to a huge value: the
    // comment walk stops, the block itself (length-framed) still counts
    val vorbisBody = 4 + 4 + 34 + 4 // magic + si header + si + vc header
    val q = vorbisBody + 4 + "graft".length + 4 // vendor len + vendor + count
    val b = good.clone()
    b(q) = 0xFF.toByte; b(q + 1) = 0xFF.toByte
    b(q + 2) = 0xFF.toByte; b(q + 3) = 0x7F.toByte
    val m = Flac.parse(b)
    assert(m.status == "ok" && m.nBlocks == 2)
    assert(m.comments.isEmpty)
  }

  test("the block cap stops a crafted empty-block flood") {
    val si = Flac.write(8000, 1, 16, 1L, Seq.empty).clone()
    si(4) = (si(4) & 0x7F).toByte // clear the last flag: blocks follow
    val flood = si ++
      Array.fill(Flac.MaxBlocks + 10)(Array[Byte](0x01, 0, 0, 0)).flatten
    val m = Flac.parse(flood)
    assert(m.nBlocks == Flac.MaxBlocks)
    assert(m.sampleRate.contains(8000), "capped walk keeps what it read")
  }
}
