package graft.multimodal

import graft.SparkTestBase

/** The JPEG/EXIF walker against HAND-LAID bytes (the Mp4Spec
  * discipline): TIFF structures assembled by hand in BOTH byte
  * orders, so a parser that assumes one endianness, right-justifies
  * inline values, resolves offsets file-relative, or trusts a
  * hostile length fails here even if writer→parser round-trips. */
class ExifSpec extends SparkTestBase {

  private def be16(x: Int): Array[Byte] =
    Array(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def le16(x: Int): Array[Byte] =
    Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)
  private def be32(x: Long): Array[Byte] =
    Array(((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
      ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def le32(x: Long): Array[Byte] = be32(x).reverse

  /** A hand-laid big-endian TIFF blob: 3 entries — inline SHORT
    * orientation, out-of-line ASCII make, inline LONG width. */
  private def mmTiff: Array[Byte] = {
    val header = "MM".getBytes ++ be16(42) ++ be32(8)
    val entryW = be16(0x0100) ++ be16(4) ++ be32(1) ++ be32(800)
    val entryMake = be16(0x010f) ++ be16(2) ++ be32(6) ++ be32(8 + 2 + 36 + 4)
    val entryOri = be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0)
    header ++ be16(3) ++ entryW ++ entryMake ++ entryOri ++ be32(0) ++
      ("Nikon".getBytes :+ 0.toByte)
  }

  private def jpeg(app1Body: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, 0xd8.toByte) ++
      Array(0xff.toByte, 0xe1.toByte) ++ be16(2 + app1Body.length) ++ app1Body ++
      Array(0xff.toByte, 0xd9.toByte)

  private def exifSeg(tiff: Array[Byte]): Array[Byte] =
    "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff

  test("hand-laid big-endian TIFF parses exactly") {
    val m = ExifCodec.parseExif(jpeg(exifSeg(mmTiff))).get
    assert(m.byteOrder == "MM")
    assert(m.width == 800L && m.orientation == 6)
    assert(m.make == "Nikon" && m.nEntries == 3)
  }

  test("a non-Exif APP1 (XMP) before the Exif segment is walked over") {
    val xmp = "http://ns.adobe.com/xap/1.0/".getBytes :+ 0.toByte
    val exif = exifSeg(mmTiff)
    val bytes = Array(0xff.toByte, 0xd8.toByte) ++
      Array(0xff.toByte, 0xe1.toByte) ++ be16(2 + xmp.length) ++ xmp ++
      Array(0xff.toByte, 0xe1.toByte) ++ be16(2 + exif.length) ++ exif ++
      Array(0xff.toByte, 0xd9.toByte)
    val m = ExifCodec.parseExif(bytes).get
    assert(m.byteOrder == "MM" && m.width == 800L && m.make == "Nikon")
  }

  test("hand-laid little-endian TIFF flips every field read") {
    val header = "II".getBytes ++ le16(42) ++ le32(8)
    val entryW = le16(0x0100) ++ le16(3) ++ le32(1) ++ le16(1024) ++ le16(0)
    val tiff = header ++ le16(1) ++ entryW ++ le32(0)
    val m = ExifCodec.parseExif(jpeg(exifSeg(tiff))).get
    assert(m.byteOrder == "II")
    // SHORT width, inline, LEFT-justified: first two bytes, LE
    assert(m.width == 1024L && m.nEntries == 1)
  }

  test("JPEG fill bytes (0xFF padding runs) before a marker are skipped") {
    // ITU T.81 B.1.1.2: markers may be preceded by any number of
    // 0xFF fill bytes — a scan that parses the pad as marker 0xFF
    // with a bogus length misreads real camera files (r8 advice)
    val exif = exifSeg(mmTiff)
    val bytes = Array(0xff.toByte, 0xd8.toByte) ++
      Array.fill(5)(0xff.toByte) ++ // fill run before APP1
      Array(0xff.toByte, 0xe1.toByte) ++ be16(2 + exif.length) ++ exif ++
      Array(0xff.toByte, 0xd9.toByte)
    val m = ExifCodec.parseExif(bytes).get
    assert(m.byteOrder == "MM" && m.width == 800L && m.make == "Nikon")
    // all-fill tail: terminates cleanly with no EXIF
    val allFill = Array(0xff.toByte, 0xd8.toByte) ++ Array.fill(6)(0xff.toByte)
    assert(ExifCodec.parseExif(allFill).isEmpty)
  }

  test("hostile inputs terminate instead of stalling or reading OOB") {
    // not a JPEG at all
    assert(ExifCodec.parseExif("II*\u0000 not a jpeg".getBytes).isEmpty)
    // SOS before any APP1: scan stops, no EXIF
    val sosFirst = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte,
      0.toByte, 4.toByte, 1.toByte, 2.toByte)
    assert(ExifCodec.parseExif(sosFirst).isEmpty)
    // segment length < 2 (hostile): walk stops
    val badLen = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xfe.toByte,
      0.toByte, 1.toByte) ++ exifSeg(mmTiff)
    assert(ExifCodec.parseExif(badLen).isEmpty)
    // segment length overrunning the payload: truncated, stop
    val overrun = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      0x7f.toByte, 0xff.toByte) ++ exifSeg(mmTiff).take(10)
    assert(ExifCodec.parseExif(overrun).isEmpty)
    // bad TIFF magic (43): None even though the wrapper is well-formed
    val badMagic = "MM".getBytes ++ be16(43) ++ be32(8) ++ be16(0) ++ be32(0)
    assert(ExifCodec.parseExif(jpeg(exifSeg(badMagic))).isEmpty)
    // IFD0 offset pointing past the blob: None
    val farIfd = "MM".getBytes ++ be16(42) ++ be32(1 << 20)
    assert(ExifCodec.parseExif(jpeg(exifSeg(farIfd))).isEmpty)
  }

  test("malformed entries are skipped, not trusted") {
    // out-of-line make whose offset overruns the blob: field stays
    // empty, the rest of the walk still lands
    val header = "MM".getBytes ++ be16(42) ++ be32(8)
    val entryMake = be16(0x010f) ++ be16(2) ++ be32(6) ++ be32(1 << 20)
    val entryOri = be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(3) ++ be16(0)
    val tiff = header ++ be16(2) ++ entryMake ++ entryOri ++ be32(0)
    val m = ExifCodec.parseExif(jpeg(exifSeg(tiff))).get
    assert(m.make == "" && m.orientation == 3 && m.nEntries == 2)
    // declared entry count overrunning the blob: walk stops at the
    // boundary with the entries that fit
    val tiff2 = header ++ be16(40) ++ entryOri ++ be32(0)
    val m2 = ExifCodec.parseExif(jpeg(exifSeg(tiff2))).get
    assert(m2.orientation == 3 && m2.nEntries == 1)
  }

  test("sub-IFD walk: GPS/Exif pointers resolve, loops and OOB pointers terminate") {
    // writer round-trip in both byte orders
    for (le <- Seq(true, false)) {
      val bytes = ExifCodec.writeJpegExifGps(le, 400, "2023:06:07 12:34:56",
        "N", Seq((51L, 1L), (30L, 1L), (123L, 10L)),
        "W", Seq((0L, 1L), (7L, 1L), (456L, 10L)))
      val g = ExifCodec.parseExifGps(bytes).get
      assert(g.byteOrder == (if (le) "II" else "MM"))
      assert(g.iso == 400 && g.dtOriginal == "2023:06:07 12:34:56")
      assert(g.latRef == "N" && g.lonRef == "W")
      assert(g.lat == Seq(51L, 1L, 30L, 1L, 123L, 10L))
      assert(g.lon == Seq(0L, 1L, 7L, 1L, 456L, 10L))
      assert(g.nExifEntries == 2 && g.nGpsEntries == 4)
    }
    // the plain-IFD0 fixture has no pointers: None, not a zeroed row
    assert(ExifCodec.parseExifGps(jpeg(exifSeg(mmTiff))).isEmpty)
    // SELF-REFERENCING pointer: an IFD0 whose ExifIFDPointer points
    // back at IFD0 itself (offset 8) — the visited set must refuse
    // the hop, or a chain of such pointers walks forever
    val loopy = {
      val header = "MM".getBytes ++ be16(42) ++ be32(8)
      val entryPtr = be16(0x8769) ++ be16(4) ++ be32(1) ++ be32(8) // -> IFD0
      header ++ be16(1) ++ entryPtr ++ be32(0)
    }
    assert(ExifCodec.parseExifGps(jpeg(exifSeg(loopy))).isEmpty)
    // pointer past the blob: skipped, not trusted
    val oob = {
      val header = "MM".getBytes ++ be16(42) ++ be32(8)
      val entryPtr = be16(0x8825) ++ be16(4) ++ be32(1) ++ be32(1 << 20)
      header ++ be16(1) ++ entryPtr ++ be32(0)
    }
    assert(ExifCodec.parseExifGps(jpeg(exifSeg(oob))).isEmpty)
    // GPS rational block overrunning the blob: coords stay empty,
    // the rest of the GPS walk still lands
    val badRat = {
      val header = "MM".getBytes ++ be16(42) ++ be32(8)
      val gpsOff = 8 + 2 + 12 + 4 // right after IFD0
      val entryPtr = be16(0x8825) ++ be16(4) ++ be32(1) ++ be32(gpsOff)
      val ifd0 = be16(1) ++ entryPtr ++ be32(0)
      val gRef = be16(0x0001) ++ be16(2) ++ be32(2) ++ ("S".getBytes ++ Array[Byte](0, 0, 0))
      val gLat = be16(0x0002) ++ be16(5) ++ be32(3) ++ be32(1 << 20)
      val gpsIfd = be16(2) ++ gRef ++ gLat ++ be32(0)
      header ++ ifd0 ++ gpsIfd
    }
    val g2 = ExifCodec.parseExifGps(jpeg(exifSeg(badRat))).get
    assert(g2.latRef == "S" && g2.lat.isEmpty && g2.nGpsEntries == 2)
  }

  test("writer → parser round-trip in both byte orders") {
    for (le <- Seq(true, false)) {
      val bytes = ExifCodec.writeJpegExif(le, 1920, 1080, 8,
        "CAM-2", "g7", 300L, 2L)
      val m = ExifCodec.parseExif(bytes).get
      assert(m.byteOrder == (if (le) "II" else "MM"))
      assert(m.width == 1920L && m.height == 1080L && m.orientation == 8)
      assert(m.make == "CAM-2" && m.software == "g7")
      assert(m.xresNum == 300L && m.xresDen == 2L && m.nEntries == 6)
    }
  }
}
