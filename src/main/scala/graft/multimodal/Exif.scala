package graft.multimodal

/** REAL JPEG/EXIF metadata walker — the photo-metadata corner of the
  * multimodal surface (the [[Mp4Codec]]/[[WavCodec]] pattern): full
  * JPEG pixel decode already rides `javax.imageio` (Image.scala), but
  * camera metadata lives in the APP1 `Exif` segment as a complete
  * embedded TIFF structure, and walking it is pure-JVM byte
  * arithmetic with a twist none of the other containers have — the
  * TIFF blob declares its OWN byte order (`II` little-endian /
  * `MM` big-endian, TIFF 6.0 §2), so every field read must flip per
  * payload. Training pipelines key on exactly these fields
  * (orientation for pixel-space normalization, make/software for
  * provenance slicing, resolution for quality gates).
  *
  * Walker discipline (the WAV hostile-chunk lesson, Wav.scala:60):
  * marker scans advance in Long, a segment length < 2 or a
  * non-advancing offset ends the walk, and every IFD entry read is
  * bounds-checked against the blob — a malformed entry is skipped,
  * never trusted. Inline values are LEFT-JUSTIFIED in the 4-byte
  * value field (TIFF 6.0 §2: "the Value is left-justified"), so a
  * SHORT reads the FIRST two bytes under either order; out-of-line
  * values (ASCII count > 4, RATIONAL) follow u32 offsets relative to
  * the TIFF blob start, not the file.
  */
object ExifCodec {

  /** Parsed EXIF facts of a JPEG payload. */
  final case class ExifMeta(
      byteOrder: String, width: Long, height: Long, orientation: Int,
      make: String, software: String, xresNum: Long, xresDen: Long,
      nEntries: Int)

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** TIFF blob reads honor the blob's declared order. */
  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (le) ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff) else u16be(b, o)

  private def u32(b: Array[Byte], o: Int, le: Boolean): Long =
    if (le)
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    else
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def asciiAt(b: Array[Byte], o: Int, n: Int): String = {
    // trailing NUL(s) stripped per TIFF ASCII type
    var end = o + n
    while (end > o && b(end - 1) == 0) end -= 1
    new String(b, o, end - o, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Parse EXIF metadata from actual JPEG bytes: scan markers for the
    * APP1 `Exif\0\0` segment, then walk the embedded TIFF IFD0. None
    * unless the payload is a JPEG holding a well-formed TIFF header. */
  def parseExif(b: Array[Byte]): Option[ExifMeta] =
    tiffRange(b).flatMap { case (from, to) => parseTiff(b, from, to) }

  /** Locate the embedded TIFF blob [from, to) behind the APP1
    * `Exif\0\0` segment — the marker scan shared by [[parseExif]]
    * and [[parseExifGps]]. */
  private def tiffRange(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var o = 2L
    while (o + 4 <= b.length) {
      if ((b(o.toInt) & 0xff) != 0xff) return None // marker desync
      // JPEG fill bytes: padding runs of 0xFF before a marker are
      // legal (ITU T.81 B.1.1.2) — skip them, or the next 0xFF would
      // be parsed as marker type 0xFF with a bogus length (r8 advice)
      while (o + 4 <= b.length && (b(o.toInt + 1) & 0xff) == 0xff) o += 1
      if (o + 4 > b.length) return None
      val marker = b(o.toInt + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no EXIF seen
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        o += 2 // standalone markers carry no length
      } else {
        val segLen = u16be(b, o.toInt + 2).toLong
        if (segLen < 2) return None // hostile length: stop
        val bodyStart = o + 4
        val bodyEnd = o + 2 + segLen
        if (bodyEnd > b.length) return None // truncated segment
        if (marker == 0xe1 && bodyEnd - bodyStart >= 6 &&
          asciiAt(b, bodyStart.toInt, 4) == "Exif" &&
          b(bodyStart.toInt + 4) == 0 && b(bodyStart.toInt + 5) == 0)
          return Some((bodyStart.toInt + 6, bodyEnd.toInt))
        if (bodyEnd <= o) return None // paranoid: never fail to advance
        o = bodyEnd
      }
    }
    None
  }

  /** Byte-order dispatch of the TIFF header at `from`; None unless
    * II/MM + magic 42. */
  private def tiffOrder(b: Array[Byte], from: Int, to: Int): Option[Boolean] = {
    if (to - from < 8) return None
    val le = asciiAt(b, from, 2) match {
      case "II" => true
      case "MM" => false
      case _ => return None
    }
    if (u16(b, from + 2, le) != 42) None else Some(le)
  }

  /** Walk one IFD's entry table at blob-relative offset `ifdOff`,
    * invoking f(tag, typ, cnt, valueFieldOffset) per in-bounds entry;
    * returns the number of entries walked (truncated tables stop at
    * the boundary, hostile offsets return 0). Shared by IFD0 and the
    * Exif/GPS sub-IFDs. */
  private def walkIfd(
      b: Array[Byte], from: Int, to: Int, le: Boolean, ifdOff: Long)(
      f: (Int, Int, Long, Int) => Unit): Int = {
    val ifdAt = from.toLong + ifdOff
    if (ifdAt < from || ifdAt + 2 > to) return 0
    val n = u16(b, ifdAt.toInt, le)
    var i = 0
    var walked = 0
    while (i < n) {
      val e = ifdAt + 2 + i.toLong * 12
      if (e + 12 > to) i = n // truncated entry table: stop the walk
      else {
        walked += 1
        f(u16(b, e.toInt, le), u16(b, e.toInt + 2, le),
          u32(b, e.toInt + 4, le), e.toInt + 8)
        i += 1
      }
    }
    walked
  }

  /** Walk the embedded TIFF structure in [from, to). */
  private def parseTiff(b: Array[Byte], from: Int, to: Int): Option[ExifMeta] = {
    val le = tiffOrder(b, from, to).getOrElse(return None)
    val order = if (le) "II" else "MM"
    var width = 0L; var height = 0L; var orientation = 0
    var make = ""; var software = ""
    var xresNum = 0L; var xresDen = 0L
    val walked = walkIfd(b, from, to, le, u32(b, from + 4, le)) {
      (tag, typ, cnt, vo) =>
        def longVal: Long =
          if (typ == 3) u16(b, vo, le).toLong
          else u32(b, vo, le)
        tag match {
          case 0x0100 if typ == 3 || typ == 4 => width = longVal
          case 0x0101 if typ == 3 || typ == 4 => height = longVal
          case 0x0112 if typ == 3 => orientation = u16(b, vo, le)
          case t if (t == 0x010f || t == 0x0131) && typ == 2 && cnt >= 1 =>
            val s =
              if (cnt <= 4) asciiAt(b, vo, cnt.toInt)
              else {
                val off = from.toLong + u32(b, vo, le)
                if (off < from || off + cnt > to) "" // OOB: skip, don't trust
                else asciiAt(b, off.toInt, cnt.toInt)
              }
            if (tag == 0x010f) make = s else software = s
          case 0x011a if typ == 5 && cnt >= 1 =>
            val off = from.toLong + u32(b, vo, le)
            if (off >= from && off + 8 <= to) {
              xresNum = u32(b, off.toInt, le)
              xresDen = u32(b, off.toInt + 4, le)
            }
          case _ => () // unknown/hostile entry: skipped, still counted
        }
    }
    if (walkIfdBounds(b, from, to, le)) // header well-formed check kept
      Some(ExifMeta(order, width, height, orientation, make, software,
        xresNum, xresDen, walked))
    else None
  }

  /** IFD0's offset lands in-bounds (the pre-refactor behavior: a
    * hostile IFD0 offset yields None, not an empty meta). */
  private def walkIfdBounds(b: Array[Byte], from: Int, to: Int, le: Boolean): Boolean = {
    val ifdAt = from.toLong + u32(b, from + 4, le)
    ifdAt >= from && ifdAt + 2 <= to
  }

  /** One hop deeper (r8 verdict #5): the fields real pipelines key on
    * live in the Exif sub-IFD (tag 0x8769 → ISO, DateTimeOriginal)
    * and the GPS IFD (tag 0x8825 → lat/long as RATIONAL[3] DMS plus
    * hemisphere refs). Pointer discipline: a sub-IFD offset that is
    * out of bounds, or that lands on an ALREADY-VISITED IFD (a
    * self-referencing/looping pointer — hostile TIFFs do this), is
    * skipped, never followed: the visited set makes every walk
    * terminate. */
  final case class ExifGps(
      byteOrder: String, iso: Int, dtOriginal: String,
      latRef: String, lonRef: String,
      lat: Seq[Long], lon: Seq[Long], // (num,den) × 3: deg, min, sec
      nExifEntries: Int, nGpsEntries: Int)

  def parseExifGps(b: Array[Byte]): Option[ExifGps] =
    tiffRange(b).flatMap { case (from, to) => parseTiffGps(b, from, to) }

  private def parseTiffGps(b: Array[Byte], from: Int, to: Int): Option[ExifGps] = {
    val le = tiffOrder(b, from, to).getOrElse(return None)
    if (!walkIfdBounds(b, from, to, le)) return None
    val ifd0 = u32(b, from + 4, le)
    var exifPtr = -1L; var gpsPtr = -1L
    walkIfd(b, from, to, le, ifd0) { (tag, typ, _, vo) =>
      if (tag == 0x8769 && typ == 4) exifPtr = u32(b, vo, le)
      if (tag == 0x8825 && typ == 4) gpsPtr = u32(b, vo, le)
    }
    // pointer-loop guard: IFD0 itself is visited; each followed
    // pointer joins the set, so a pointer back at a walked IFD is dead
    var visited = Set(ifd0)
    def follow(ptr: Long)(f: (Int, Int, Long, Int) => Unit): Int = {
      if (ptr < 0 || visited.contains(ptr)) return 0
      val at = from.toLong + ptr
      if (at < from || at + 2 > to) return 0
      visited += ptr
      walkIfd(b, from, to, le, ptr)(f)
    }
    def rational3(vo: Int): Seq[Long] = {
      val off = from.toLong + u32(b, vo, le)
      if (off < from || off + 24 > to) Seq.empty
      else (0 until 3).flatMap(i =>
        Seq(u32(b, off.toInt + i * 8, le), u32(b, off.toInt + i * 8 + 4, le)))
    }
    var iso = 0; var dt = ""
    val nExif = follow(exifPtr) { (tag, typ, cnt, vo) =>
      tag match {
        case 0x8827 if typ == 3 => iso = u16(b, vo, le)
        case 0x9003 if typ == 2 && cnt >= 1 =>
          dt =
            if (cnt <= 4) asciiAt(b, vo, cnt.toInt)
            else {
              val off = from.toLong + u32(b, vo, le)
              if (off < from || off + cnt > to) ""
              else asciiAt(b, off.toInt, cnt.toInt)
            }
        case _ => ()
      }
    }
    var latRef = ""; var lonRef = ""
    var lat: Seq[Long] = Seq.empty; var lon: Seq[Long] = Seq.empty
    val nGps = follow(gpsPtr) { (tag, typ, cnt, vo) =>
      tag match {
        case 0x0001 if typ == 2 && cnt >= 1 && cnt <= 4 =>
          latRef = asciiAt(b, vo, cnt.toInt)
        case 0x0003 if typ == 2 && cnt >= 1 && cnt <= 4 =>
          lonRef = asciiAt(b, vo, cnt.toInt)
        case 0x0002 if typ == 5 && cnt == 3 => lat = rational3(vo)
        case 0x0004 if typ == 5 && cnt == 3 => lon = rational3(vo)
        case _ => ()
      }
    }
    if (nExif == 0 && nGps == 0) None
    else Some(ExifGps(if (le) "II" else "MM", iso, dt, latRef, lonRef,
      lat, lon, nExif, nGps))
  }

  /** Canonical minimal JPEG-with-EXIF writer — SOI + COM + APP1(Exif
    * TIFF IFD0) + EOI — the independent code path the parser
    * round-trips against. The TIFF blob is emitted in the requested
    * byte order; entries exercise all four storage shapes a real
    * camera file uses: inline LONG (dims), inline SHORT
    * (orientation), inline ASCII (software, count ≤ 4), out-of-line
    * ASCII (make) and out-of-line RATIONAL (resolution). */
  def writeJpegExif(
      littleEndian: Boolean, width: Int, height: Int, orientation: Int,
      make: String, software: String, xresNum: Long, xresDen: Long): Array[Byte] = {
    require(make.length + 1 > 4, "make must be out-of-line (count > 4)")
    require(software.length + 1 <= 4, "software must be inline (count <= 4)")
    val makeBytes = make.getBytes(java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte
    val ord = if (littleEndian)
      java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
    // TIFF blob: header 8 + count 2 + 6 entries × 12 + next-IFD 4,
    // then the out-of-line area: make bytes + 8-byte rational
    val entriesEnd = 8 + 2 + 6 * 12 + 4
    val makeOff = entriesEnd
    val ratOff = makeOff + makeBytes.length
    val tiff = java.nio.ByteBuffer.allocate(ratOff + 8).order(ord)
    tiff.put((if (littleEndian) "II" else "MM").getBytes)
      .putShort(42.toShort).putInt(8)
    tiff.putShort(6.toShort)
    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      tiff.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt.toInt)
      val before = tiff.position()
      value
      while (tiff.position() < before + 4) tiff.put(0.toByte) // pad right
    }
    entry(0x0100, 4, 1L) { tiff.putInt(width) }
    entry(0x0101, 4, 1L) { tiff.putInt(height) }
    entry(0x010f, 2, makeBytes.length.toLong) { tiff.putInt(makeOff) }
    entry(0x0112, 3, 1L) { tiff.putShort(orientation.toShort) }
    entry(0x011a, 5, 1L) { tiff.putInt(ratOff) }
    entry(0x0131, 2, software.length.toLong + 1) {
      tiff.put(software.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(0.toByte)
    }
    tiff.putInt(0) // next IFD
    tiff.put(makeBytes)
    tiff.putInt(xresNum.toInt).putInt(xresDen.toInt)
    val tb = tiff.array()

    val com = "graftcm".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val app1Len = 2 + 6 + tb.length
    val out = java.nio.ByteBuffer
      .allocate(2 + (4 + com.length) + (2 + app1Len) + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putShort(0xffd8.toShort)
    // a COM segment BEFORE APP1 so the parser must actually scan
    out.putShort(0xfffe.toShort).putShort((2 + com.length).toShort).put(com)
    out.putShort(0xffe1.toShort).putShort(app1Len.toShort)
      .put("Exif".getBytes).put(0.toByte).put(0.toByte).put(tb)
    out.putShort(0xffd9.toShort)
    out.array()
  }

  /** Canonical JPEG writer WITH sub-IFDs — the fixture behind
    * `mm_exif_gps`: IFD0 carries a normal entry plus the
    * ExifIFDPointer (0x8769) and GPSIFDPointer (0x8825); the Exif
    * sub-IFD holds ISO (inline SHORT) + DateTimeOriginal (out-of-line
    * 20-byte ASCII); the GPS IFD holds hemisphere refs (inline
    * 2-byte ASCII) + lat/long as out-of-line RATIONAL[3] DMS — the
    * real camera layout, in either byte order. */
  def writeJpegExifGps(
      littleEndian: Boolean, iso: Int, dtOriginal: String,
      latRef: String, lat: Seq[(Long, Long)],
      lonRef: String, lon: Seq[(Long, Long)]): Array[Byte] = {
    require(dtOriginal.length == 19, "DateTimeOriginal must be YYYY:MM:DD HH:MM:SS")
    require(latRef.length == 1 && lonRef.length == 1, "refs are single chars")
    require(lat.length == 3 && lon.length == 3, "DMS rationals: 3 each")
    val ord = if (littleEndian)
      java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
    // blob-relative layout: header 8 | IFD0 (3 entries) 42 |
    // Exif IFD (2 entries) 30 | GPS IFD (4 entries) 54 | data area
    val ifd0Off = 8
    val exifOff = ifd0Off + 2 + 3 * 12 + 4
    val gpsOff = exifOff + 2 + 2 * 12 + 4
    val dtOff = gpsOff + 2 + 4 * 12 + 4
    val latOff = dtOff + 20
    val lonOff = latOff + 24
    val tiff = java.nio.ByteBuffer.allocate(lonOff + 24).order(ord)
    tiff.put((if (littleEndian) "II" else "MM").getBytes)
      .putShort(42.toShort).putInt(ifd0Off)
    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      tiff.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt.toInt)
      val before = tiff.position()
      value
      while (tiff.position() < before + 4) tiff.put(0.toByte) // pad right
    }
    tiff.putShort(3.toShort) // IFD0
    entry(0x0100, 4, 1L) { tiff.putInt(1920) }
    entry(0x8769, 4, 1L) { tiff.putInt(exifOff) }
    entry(0x8825, 4, 1L) { tiff.putInt(gpsOff) }
    tiff.putInt(0)
    tiff.putShort(2.toShort) // Exif sub-IFD
    entry(0x8827, 3, 1L) { tiff.putShort(iso.toShort) }
    entry(0x9003, 2, 20L) { tiff.putInt(dtOff) }
    tiff.putInt(0)
    tiff.putShort(4.toShort) // GPS IFD
    entry(0x0001, 2, 2L) {
      tiff.put(latRef.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(0.toByte)
    }
    entry(0x0002, 5, 3L) { tiff.putInt(latOff) }
    entry(0x0003, 2, 2L) {
      tiff.put(lonRef.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(0.toByte)
    }
    entry(0x0004, 5, 3L) { tiff.putInt(lonOff) }
    tiff.putInt(0)
    tiff.put(dtOriginal.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .put(0.toByte)
    lat.foreach { case (n, d) => tiff.putInt(n.toInt).putInt(d.toInt) }
    lon.foreach { case (n, d) => tiff.putInt(n.toInt).putInt(d.toInt) }
    val tb = tiff.array()
    val app1Len = 2 + 6 + tb.length
    val out = java.nio.ByteBuffer.allocate(2 + (2 + app1Len) + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putShort(0xffd8.toShort)
    out.putShort(0xffe1.toShort).putShort(app1Len.toShort)
      .put("Exif".getBytes).put(0.toByte).put(0.toByte).put(tb)
    out.putShort(0xffd9.toShort)
    out.array()
  }
}
