package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The WebVTT parser against the spec's core shapes and the hostile
  * inputs a crawl's caption files actually contain — one behavior per
  * assertion, the Exif/Mp4 walker discipline. */
class VttSpec extends AnyFunSuite {
  import Vtt.{parse, parseTs, formatTs}

  test("timestamps: both shapes parse; strict field widths reject sloppy forms") {
    assert(parseTs("00:00:01.000").contains(1000L))
    assert(parseTs("01:02:03.456").contains(3723456L))
    assert(parseTs("02:03.456").contains(123456L))
    assert(parseTs("123:00:00.000").contains(123L * 3600000)) // hours unbounded
    assert(parseTs("1:02.000").isEmpty)   // minutes must be two digits
    assert(parseTs("00:2.000").isEmpty)   // seconds must be two digits
    assert(parseTs("00:02.00").isEmpty)   // millis must be three digits
    assert(parseTs("00:61.000").isEmpty)  // seconds < 60
    assert(parseTs("61:00.000").isEmpty)  // minutes < 60
    assert(parseTs("00:00:02").isEmpty)   // millis required
    assert(parseTs("garbage").isEmpty)
  }

  test("formatTs round-trips through parseTs in both shapes") {
    for (ms <- Seq(0L, 999L, 1000L, 59999L, 60000L, 3599999L, 3600000L, 7265432L)) {
      assert(parseTs(formatTs(ms)).contains(ms), s"long form $ms")
      if (ms < 3600000L) assert(parseTs(formatTs(ms, shortForm = true)).contains(ms))
    }
  }

  test("a minimal file parses; header is mandatory") {
    val ok = parse("WEBVTT\n\n00:01.000 --> 00:02.000\nhello\n")
    assert(ok.map(c => (c.startMs, c.endMs, c.lines)) ==
      Vector((1000L, 2000L, Vector("hello"))))
    assert(parse("00:01.000 --> 00:02.000\nhello\n").isEmpty, "headerless is not VTT")
    assert(parse("").isEmpty)
    assert(parse("WEBVTT - with trailing text\n\n00:01.000 --> 00:02.000\nx\n").size == 1)
  }

  test("cue ids, settings, NOTE/STYLE blocks, multi-line payloads, CRLF") {
    val v = "WEBVTT\r\n\r\nNOTE a comment\r\nspanning lines\r\n\r\n" +
      "id-1\r\n00:01.000 --> 00:02.500 align:start position:10%\r\n" +
      "line a\r\nline b\r\n\r\n" +
      "STYLE\r\n::cue { color: red }\r\n\r\n" +
      "00:03.000 --> 00:04.000\r\nsolo\r\n"
    val cues = parse(v)
    assert(cues.size == 2)
    assert(cues(0).startMs == 1000L && cues(0).endMs == 2500L)
    assert(cues(0).lines == Vector("line a", "line b"))
    assert(cues(1).idx == 1 && cues(1).lines == Vector("solo"))
  }

  test("malformed cues are skipped whole, never thrown on; indices stay dense") {
    val v = "WEBVTT\n\n" +
      "99:99 --> nonsense\ndropped\n\n" +          // bad timing
      "00:02.000 --> 00:01.000\nbackwards\n\n" +   // end <= start
      "00:05.000 --> 00:06.000\nkept\n\n" +
      "just some stray text\nwith no timing\n\n" + // stray block
      "00:07.000 --> 00:08.000\nalso kept"         // EOF without blank line
    val cues = parse(v)
    assert(cues.map(_.lines.head) == Vector("kept", "also kept"))
    assert(cues.map(_.idx) == Vector(0, 1), "kept-cue indices must stay dense")
  }
}
