package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

/** WARC (ISO 28500) record parsing — the wire format web-crawl
  * corpora actually arrive in (Common Crawl ships petabytes of it),
  * and therefore the FIRST source a pretraining pipeline reads. The
  * defining property of the format is Content-Length FRAMING: a
  * record's payload is skipped by byte count, never by delimiter
  * scan, so a payload that itself contains `WARC/1.1` lines (crawled
  * pages quote WARC files all the time) must ride through untouched.
  * A line-oriented reader silently shreds such records — the gate
  * query plants exactly that trap.
  *
  * Hostile-input discipline of the multimodal walkers applied to a
  * text container: a record whose Content-Length doesn't parse has
  * LOST its framing — the reader drops it and RESYNCS by scanning
  * for the next version line at line start (strict `WARC/<d.d>` +
  * EOL match, so an embedded `WARC/1.1 embedded` payload line can't
  * fake a record boundary); a missing mandatory header (WARC-Type
  * here) marks the record invalid but keeps it — the framing is
  * intact and a curation pipeline wants the payload AND the fact
  * that its envelope is broken; a Content-Length past EOF truncates
  * to the available bytes and marks the record. Header count per
  * record and total records are capped.
  */
object Warc {

  /** Hostile caps: headers per record, records per file. */
  val MaxHeaders = 256
  val MaxRecords = 1 << 22

  /** One parsed record: lowercased header map, raw payload bytes,
    * `truncated` when Content-Length overran the file. */
  final case class Record(
      headers: Map[String, String],
      payload: Array[Byte],
      truncated: Boolean) {
    def warcType: Option[String] = headers.get("warc-type")
    def targetUri: Option[String] = headers.get("warc-target-uri")
    def contentLength: Long = payload.length.toLong
    /** Mandatory-envelope check (ISO 28500 §5.2 requires record-id,
      * content-length, date, type). */
    def valid: Boolean =
      Seq("warc-record-id", "content-length", "warc-date", "warc-type")
        .forall(headers.contains)
  }

  /** True iff `bytes` at `i` starts a STRICT version line:
    * `WARC/<digits>.<digits>` then CR/LF — trailing junk on the line
    * (an embedded quote of a WARC file) is NOT a record boundary. */
  private def isVersionLineAt(bytes: Array[Byte], i: Int): Boolean = {
    val tag = "WARC/".getBytes(US_ASCII)
    if (i + tag.length >= bytes.length) return false
    var k = 0
    while (k < tag.length) {
      if (bytes(i + k) != tag(k)) return false
      k += 1
    }
    var j = i + tag.length
    var digits = 0
    var dots = 0
    var ok = true
    while (ok && j < bytes.length && bytes(j) != '\r' && bytes(j) != '\n') {
      val c = bytes(j)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') dots += 1
      else ok = false
      j += 1
    }
    ok && digits > 0 && dots <= 1 && j < bytes.length
  }

  /** Scan forward from `from` to the next version line at line
    * start; -1 when none. */
  private def nextRecordStart(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i < bytes.length) {
      if ((i == 0 || bytes(i - 1) == '\n') && isVersionLineAt(bytes, i))
        return i
      i += 1
    }
    -1
  }

  /** Read one header/version line ending at CRLF or LF; returns
    * (line-without-EOL, index-after-EOL). */
  private def readLine(bytes: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i < bytes.length && bytes(i) != '\n') i += 1
    val end = if (i > from && bytes(i - 1) == '\r') i - 1 else i
    (new String(bytes, from, end - from, US_ASCII),
      math.min(i + 1, bytes.length))
  }

  /** Parse a whole WARC file's records. Never throws on hostile
    * bytes; bad-framing records are dropped with a resync, intact
    * ones are kept (possibly `valid == false`). */
  def parse(bytes: Array[Byte]): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var pos = nextRecordStart(bytes, 0)
    var n = 0
    while (pos >= 0 && n < MaxRecords) {
      val (_, afterVersion) = readLine(bytes, pos)
      // headers to the blank line
      var i = afterVersion
      var hdrs = Map.empty[String, String]
      var nh = 0
      var blank = false
      var broken = false
      var brokenLineStart = -1
      while (!blank && !broken && i < bytes.length && nh < MaxHeaders) {
        val lineStart = i
        val (line, next) = readLine(bytes, i)
        i = next
        if (line.isEmpty) blank = true
        else {
          val c = line.indexOf(':')
          if (c <= 0) {
            // not a header line: this record's framing is lost. The
            // offending line may itself be the NEXT record's version
            // line (a record missing its blank line), so the resync
            // scan must re-include it.
            broken = true
            brokenLineStart = lineStart
          } else {
            hdrs += (line.substring(0, c).trim.toLowerCase ->
              line.substring(c + 1).trim)
            nh += 1
          }
        }
      }
      val lenOpt = hdrs.get("content-length")
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .filter(v => v >= 0 && v <= Int.MaxValue)
      if (broken || !blank || lenOpt.isEmpty) {
        // framing lost: drop this record, resync at the next version line
        pos = nextRecordStart(bytes, if (broken) brokenLineStart else i)
      } else {
        val len = lenOpt.get.toInt
        val avail = math.min(len, bytes.length - i)
        val payload = java.util.Arrays.copyOfRange(bytes, i, i + avail)
        out += Record(hdrs, payload, truncated = avail < len)
        n += 1
        pos = nextRecordStart(bytes, i + avail)
      }
    }
    out.result()
  }

  /** Render one record with CRLF line endings and correct
    * Content-Length — the writer half the gate fixture uses. Header
    * order is the insertion order of `headers`; a caller-supplied
    * `Content-Length` (the corrupted-framing fixture class)
    * SUPPRESSES the computed one. */
  def render(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    if (!headers.exists(_._1.equalsIgnoreCase("content-length")))
      sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    sb.toString.getBytes(US_ASCII) ++ payload ++ "\r\n\r\n".getBytes(US_ASCII)
  }
}
