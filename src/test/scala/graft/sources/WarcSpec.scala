package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

/** The WARC record parser against the format's defining property —
  * Content-Length framing — and the walker family's hostile inputs.
  * One behavior per assertion. */
class WarcSpec extends AnyFunSuite {

  private def rec(id: Long, payload: String,
      extra: Seq[(String, String)] = Seq.empty,
      withType: Boolean = true): Array[Byte] = {
    val base = Seq(
      "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> s"http://ex.com/$id") ++
      (if (withType) Seq("WARC-Type" -> "response") else Seq.empty) ++ extra
    Warc.render(base, payload.getBytes(US_ASCII))
  }

  test("render → parse round trip: headers lowercased, payload byte-exact, valid") {
    val rs = Warc.parse(rec(1, "hello world"))
    assert(rs.size == 1)
    val r = rs.head
    assert(r.valid && !r.truncated)
    assert(r.warcType.contains("response"))
    assert(r.targetUri.contains("http://ex.com/1"))
    assert(new String(r.payload, US_ASCII) == "hello world")
    assert(r.contentLength == 11)
  }

  test("framing carries a payload that IS a fake WARC record — never split") {
    val trap = "WARC/1.1\r\nWARC-Type: fake\r\nContent-Length: 0\r\n\r\n"
    val rs = Warc.parse(rec(2, trap) ++ rec(3, "after"))
    assert(rs.size == 2, "the embedded record text must stay payload")
    assert(new String(rs(0).payload, US_ASCII) == trap)
    assert(new String(rs(1).payload, US_ASCII) == "after")
  }

  test("corrupted Content-Length drops the record and resyncs on the next one") {
    val bad = rec(4, "lost payload", extra = Seq("Content-Length" -> "xyz"))
    val rs = Warc.parse(bad ++ rec(5, "kept"))
    assert(rs.map(r => new String(r.payload, US_ASCII)) == Vector("kept"))
  }

  test("an embedded 'WARC/1.1 embedded' line cannot fake a resync boundary") {
    val bad = rec(6, "WARC/1.1 embedded\r\nmore", extra = Seq("Content-Length" -> "nope"))
    val rs = Warc.parse(bad ++ rec(7, "real"))
    assert(rs.map(r => new String(r.payload, US_ASCII)) == Vector("real"))
  }

  test("missing mandatory header keeps the record (framing intact) but marks invalid") {
    val rs = Warc.parse(rec(8, "payload", withType = false))
    assert(rs.size == 1 && !rs.head.valid)
    assert(rs.head.warcType.isEmpty)
    assert(new String(rs.head.payload, US_ASCII) == "payload")
  }

  test("Content-Length past EOF truncates to available bytes and says so") {
    val full = rec(9, "0123456789")
    val cut = full.dropRight(14) // payload tail + trailing CRLFCRLF gone
    val rs = Warc.parse(cut)
    assert(rs.size == 1 && rs.head.truncated)
    assert(rs.head.payload.length < 10)
  }

  test("a record missing its blank line resyncs WITHOUT losing the next record") {
    val broken = ("WARC/1.1\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:10>\r\n").getBytes(US_ASCII) // no blank, no length
    val rs = Warc.parse(broken ++ rec(11, "survivor"))
    assert(rs.map(r => new String(r.payload, US_ASCII)) == Vector("survivor"))
  }

  test("junk before the first record is skipped; junk-only input yields nothing") {
    val rs = Warc.parse("some leading junk\r\n".getBytes(US_ASCII) ++ rec(12, "x"))
    assert(rs.size == 1)
    assert(Warc.parse("no records here at all".getBytes(US_ASCII)).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
  }

  test("negative and absurd Content-Length values lose framing, never allocate") {
    val neg = rec(13, "p", extra = Seq("Content-Length" -> "-5"))
    val huge = rec(14, "p", extra = Seq("Content-Length" -> "999999999999999999999"))
    assert(Warc.parse(neg ++ rec(15, "ok")).map(r =>
      new String(r.payload, US_ASCII)) == Vector("ok"))
    assert(Warc.parse(huge ++ rec(16, "ok2")).map(r =>
      new String(r.payload, US_ASCII)) == Vector("ok2"))
  }

  test("the header cap stops a crafted endless-header record") {
    val flood = ("WARC/1.1\r\n" +
      (1 to Warc.MaxHeaders + 50).map(i => s"X-$i: v\r\n").mkString).getBytes(US_ASCII)
    val rs = Warc.parse(flood ++ rec(17, "tail"))
    assert(rs.map(r => new String(r.payload, US_ASCII)) == Vector("tail"))
  }
}
