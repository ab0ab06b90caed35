package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** The ZIP central-directory walker against real `java.util.zip`
  * archives and the format's defining hostile inputs — the truth is
  * at the END (EOCD behind a variable-length comment), and the
  * central directory, not the local headers, carries the entry
  * facts. */
class ZipSpec extends AnyFunSuite {

  private def realZip(entries: Seq[(String, String)],
      comment: Option[String] = None,
      stored: Set[Int] = Set.empty): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    comment.foreach(z.setComment)
    entries.zipWithIndex.foreach { case ((name, content), i) =>
      val e = new ZipEntry(name)
      val bytes = content.getBytes("UTF-8")
      if (stored(i)) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        e.setCompressedSize(bytes.length.toLong)
        val c = new CRC32; c.update(bytes); e.setCrc(c.getValue)
      }
      z.putNextEntry(e); z.write(bytes); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("a real archive walks clean: names, methods, sizes from the central directory") {
    val b = realZip(Seq("a/x.txt" -> "hello", "b/y.txt" -> "world!!"),
      stored = Set(1))
    val m = Zip.parse(b)
    assert(m.status == "ok" && m.claimed == 2)
    assert(m.entries.map(_.name) == Vector("a/x.txt", "b/y.txt"))
    assert(m.entries(0).method == 8 && m.entries(1).method == 0)
    assert(m.entries.map(_.uncompressedSize) == Vector(5L, 7L))
    assert(m.entries(1).compressedSize == 7L, "stored: csize == usize")
    assert(m.comment.isEmpty)
  }

  test("EOCD behind a trailing comment is found; a fixed-offset reader would miss it") {
    val b = realZip(Seq("e.txt" -> "data"), comment = Some("archive comment here"))
    val m = Zip.parse(b)
    assert(m.status == "ok")
    assert(m.comment.contains("archive comment here"))
    assert(m.entries.map(_.name) == Vector("e.txt"))
  }

  test("an EOCD magic INSIDE the comment cannot fake the record") {
    // the consistency check (comment length field must reach EOF)
    // rejects in-comment magic hits on the backward scan
    val trap = "PK fake eocd bytes inside a comment 0123456789"
    val m = Zip.parse(realZip(Seq("t.txt" -> "x"), comment = Some(trap)))
    assert(m.status == "ok" && m.entries.size == 1)
    assert(m.comment.contains(trap))
  }

  test("an empty archive is ok with zero entries") {
    val m = Zip.parse(realZip(Seq.empty))
    assert(m.status == "ok" && m.claimed == 0 && m.entries.isEmpty)
  }

  test("no EOCD classifies: tail cut, tiny input, garbage") {
    val b = realZip(Seq("a.txt" -> "abc"))
    assert(Zip.parse(b.dropRight(3)).status == "no_eocd")
    assert(Zip.parse(Array.emptyByteArray).status == "no_eocd")
    assert(Zip.parse("not a zip at all".getBytes).status == "no_eocd")
  }

  test("a lying entry count classifies count_mismatch, real entries still listed") {
    val b = realZip(Seq("a.txt" -> "abc", "b.txt" -> "de")).clone()
    val eocd = b.length - 22
    b(eocd + 10) = 3 // claimed 2 -> 3 (little-endian low byte)
    b(eocd + 8) = 3  // total-entries field kept consistent
    val m = Zip.parse(b)
    assert(m.status == "count_mismatch" && m.claimed == 3)
    assert(m.entries.map(_.name) == Vector("a.txt", "b.txt"))
  }

  test("a central-directory offset past the EOCD classifies truncated") {
    val b = realZip(Seq("a.txt" -> "abc")).clone()
    val eocd = b.length - 22
    b(eocd + 16) = 0xFF.toByte; b(eocd + 17) = 0xFF.toByte
    b(eocd + 18) = 0xFF.toByte; b(eocd + 19) = 0x7F.toByte
    assert(Zip.parse(b).status == "truncated")
  }
}
