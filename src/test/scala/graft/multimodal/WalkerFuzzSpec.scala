package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for the container walkers' never-throws contract — the
  * UrlOpsSpec fuzz discipline applied to bytes: a crawl's payloads
  * are adversarial by default, and a walker that throws turns one
  * corrupt object into a dead task (and, retried, a dead job).
  * Three input classes per walker: pure random bytes, random bytes
  * behind a VALID magic (the parser commits, then meets garbage),
  * and random single-byte mutations of a VALID fixture (framing
  * mostly intact, one lie somewhere). Deterministic seed — failures
  * reproduce. */
class WalkerFuzzSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0xF00DL)
  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rng.nextBytes(b); b
  }
  private def mutate(src: Array[Byte]): Array[Byte] = {
    val b = src.clone()
    (1 to 1 + rng.nextInt(3)).foreach { _ =>
      b(rng.nextInt(b.length)) = (rng.nextInt(256) - 128).toByte
    }
    b
  }

  private def drive(name: String, valid: Array[Byte], magic: Array[Byte],
      parse: Array[Byte] => Any): Unit = {
    for (i <- 1 to 300) {
      val input = (i % 3) match {
        case 0 => randomBytes(rng.nextInt(400))
        case 1 => magic ++ randomBytes(rng.nextInt(400))
        case _ => mutate(valid)
      }
      try parse(input)
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on case $i " +
            s"(${input.length} bytes): ${e.getMessage}")
      }
    }
  }

  test("Warc.parse never throws on hostile bytes") {
    val valid = graft.sources.Warc.render(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:1>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> "http://ex.com/1"),
      "payload body".getBytes("US-ASCII"))
    drive("Warc", valid, "WARC/1.1\r\n".getBytes("US-ASCII"),
      graft.sources.Warc.parse)
  }

  test("Png.parse never throws on hostile bytes") {
    val valid = ImageCodec.encode(ImageCodec.renderGray(7, 12, 9), "png")
    drive("Png", valid, Png.Signature, Png.parse)
  }

  test("Jpeg.parse never throws on hostile bytes") {
    val valid = ImageCodec.encode(ImageCodec.renderGray(7, 12, 9), "jpg")
    drive("Jpeg", valid, Array(0xFF.toByte, 0xD8.toByte), Jpeg.parse)
  }

  test("Gif.parse never throws on hostile bytes") {
    val valid = ImageCodec.encode(ImageCodec.renderGray(7, 12, 9), "gif")
    drive("Gif", valid, "GIF89a".getBytes("ISO-8859-1"), Gif.parse)
  }

  test("Flac.parse never throws on hostile bytes") {
    val valid = Flac.write(44100, 2, 16, 1000L, Seq("TITLE" -> "t"))
    drive("Flac", valid, "fLaC".getBytes("US-ASCII"), Flac.parse)
  }

  test("Id3.parse never throws on hostile bytes") {
    val valid = Id3.write(4, Seq(("TIT2", 0, "T"), ("TALB", 0, "A")))
    drive("Id3", valid, Array[Byte]('I', 'D', '3', 4, 0, 0), Id3.parse)
  }

  test("Zip.parse never throws on hostile bytes") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    z.write("abc".getBytes("US-ASCII")); z.closeEntry(); z.close()
    drive("Zip", bos.toByteArray, Array[Byte]('P', 'K', 3, 4), Zip.parse)
  }

  test("Vtt.parse never throws on hostile text") {
    val valid = "WEBVTT\n\n00:01.000 --> 00:02.000\nhello\n"
      .getBytes("UTF-8")
    drive("Vtt", valid, "WEBVTT\n".getBytes("UTF-8"),
      b => Vtt.parse(new String(b, "UTF-8")))
  }
}
