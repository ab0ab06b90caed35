package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

/** `.warc.gz` member framing (r10 verdict missing #3): per-record
  * gzip members concatenated into one object, walked with a raw
  * member parser (header parse + Inflater + CRC/ISIZE trailer) so a
  * corrupt member drops ONE record and the walk resyncs at the next
  * member magic. One behavior per assertion. */
class WarcGzSpec extends AnyFunSuite {

  private def rec(id: Long, payload: String): Array[Byte] =
    Warc.render(Seq(
      "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> s"http://ex.com/$id",
      "WARC-Type" -> "response"), payload.getBytes(US_ASCII))

  private def obj(recs: Array[Byte]*): Array[Byte] =
    recs.map(Warc.gzMember).reduce(_ ++ _)

  test("member round trip: one member per record, payloads byte-exact") {
    val rs = Warc.parseGz(obj(rec(1, "alpha beta"), rec(2, "gamma")))
    assert(rs.size == 2)
    assert(rs.map(r => new String(r.payload, US_ASCII)) ==
      Vector("alpha beta", "gamma"))
    assert(rs.forall(_.valid))
  }

  test("a flipped deflate byte drops THAT member only; later members still land") {
    val bad = Warc.gzMember(rec(2, "poisoned"))
    bad(12) = (bad(12) ^ 0x5A).toByte
    val rs = Warc.parseGz(
      Warc.gzMember(rec(1, "first")) ++ bad ++ Warc.gzMember(rec(3, "third")))
    assert(rs.map(_.targetUri.get) ==
      Vector("http://ex.com/1", "http://ex.com/3"))
  }

  test("a truncated final member is dropped, not thrown on") {
    val full = obj(rec(1, "keep"), rec(2, "cut off"))
    val cut = full.dropRight(6) // inside member 2's trailer
    val rs = Warc.parseGz(cut)
    assert(rs.map(_.targetUri.get) == Vector("http://ex.com/1"))
  }

  test("a corrupted TRAILER (CRC mismatch) classifies the member corrupt") {
    val m = Warc.gzMember(rec(1, "crc matters"))
    m(m.length - 6) = (m(m.length - 6) ^ 0x01).toByte // inside stored CRC32
    assert(Warc.parseGz(m).isEmpty)
    // and with a healthy sibling after it, the sibling survives
    val rs = Warc.parseGz(m ++ Warc.gzMember(rec(2, "ok")))
    assert(rs.map(_.targetUri.get) == Vector("http://ex.com/2"))
  }

  test("optional gzip header fields (FNAME) are skipped, not misparsed") {
    // hand-build a member with FLG.FNAME set: splice a name between
    // the 10-byte header and the deflate data
    val plain = Warc.gzMember(rec(7, "named member"))
    val withName = plain.take(3) ++ Array(0x08.toByte) ++
      plain.slice(4, 10) ++ "member.warc\u0000".getBytes(US_ASCII) ++
      plain.drop(10)
    val rs = Warc.parseGz(withName)
    assert(rs.map(_.targetUri.get) == Vector("http://ex.com/7"))
  }

  test("the embedded WARC/1.1 trap line survives the gz layer") {
    val rs = Warc.parseGz(obj(rec(1, "before\nWARC/1.1 embedded\r\nafter")))
    assert(rs.size == 1)
    assert(new String(rs.head.payload, US_ASCII).contains("WARC/1.1 embedded"))
  }

  test("junk between members resyncs on the next member magic") {
    val rs = Warc.parseGz(
      Warc.gzMember(rec(1, "a")) ++ "NOT GZIP AT ALL".getBytes(US_ASCII) ++
        Warc.gzMember(rec(2, "b")))
    assert(rs.map(_.targetUri.get) ==
      Vector("http://ex.com/1", "http://ex.com/2"))
  }

  test("oversize member drop is COUNTED (r12 advice: cap drops were " +
      "indistinguishable from corruption), later members still land") {
    // a member whose decompressed payload exceeds the cap: highly
    // compressible so the compressed object stays small
    val big = rec(1, "x" * (Warc.MaxMemberBytes + 1024))
    val before = Warc.oversizeDrops.get()
    val rs = Warc.parseGz(Warc.gzMember(big) ++ Warc.gzMember(rec(2, "ok")))
    assert(Warc.oversizeDrops.get() >= before + 1)
    assert(rs.map(_.targetUri.get) == Vector("http://ex.com/2"))
  }

  test("parseGz never throws on hostile bytes (the walker-family fuzz)") {
    val rng = new scala.util.Random(11)
    val valid = obj(rec(1, "fuzz me"))
    for (i <- 1 to 300) {
      val input = (i % 3) match {
        case 0 => Array.fill(rng.nextInt(400))((rng.nextInt(256) - 128).toByte)
        case 1 => Array[Byte](0x1F.toByte, 0x8B.toByte, 0x08.toByte) ++
          Array.fill(rng.nextInt(400))((rng.nextInt(256) - 128).toByte)
        case _ =>
          val b = valid.clone()
          (1 to 1 + rng.nextInt(3)).foreach { _ =>
            b(rng.nextInt(b.length)) = (rng.nextInt(256) - 128).toByte
          }
          b
      }
      try Warc.parseGz(input)
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          fail(s"parseGz threw ${e.getClass.getSimpleName} on case $i: ${e.getMessage}")
      }
    }
  }
}
