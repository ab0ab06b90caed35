package graft.multimodal

import graft.SparkTestBase

/** The ISO-BMFF walker against HAND-LAID boxes (the WavSpec
  * discipline): fixture bytes assembled by hand, not by the writer
  * under test, so a parser that peeks fixed offsets, misreads
  * big-endian fields, or trusts a hostile size fails here even if
  * writer→parser round-trips. */
class Mp4Spec extends SparkTestBase {

  private def be32(x: Long): Array[Byte] =
    Array(((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
      ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def be64(x: Long): Array[Byte] = be32(x >>> 32) ++ be32(x & 0xffffffffL)

  private def box(id: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ id.getBytes ++ body

  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes ++ be32(0) ++ "mp42".getBytes)

  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
      Array.fill[Byte](100 - 20)(0))

  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    box("tkhd", be32(0) ++ Array.fill[Byte](76 - 4)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  test("hand-laid v0 boxes parse exactly; free boxes before moov are walked over") {
    val bytes = ftyp ++ box("free", Array.fill[Byte](13)(9)) ++
      box("moov", mvhdV0(90000, 2700000) ++ box("trak", tkhdV0(1920, 1080))) ++
      box("mdat", Array.fill[Byte](50)(1))
    val m = Mp4Codec.parseMp4(bytes).get
    assert(m.majorBrand == "isom")
    assert(m.timescale == 90000L && m.durationUnits == 2700000L)
    assert(m.durationMs == 30000L)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.nTopBoxes == 4)
  }

  test("version-1 mvhd/tkhd (64-bit times) parse from their shifted offsets") {
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1000) ++ be64(45000L) ++
        Array.fill[Byte](112 - 32)(0))
    val tkhd1 = box("tkhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](88 - 4)(0) ++
        be32(640L << 16) ++ be32(480L << 16))
    val bytes = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1))
    val m = Mp4Codec.parseMp4(bytes).get
    assert(m.timescale == 1000L && m.durationUnits == 45000L && m.durationMs == 45000L)
    assert(m.width == 640 && m.height == 480)
  }

  test("hostile sizes terminate the walk instead of stalling or rewinding") {
    // size 7 (< header) — a non-advancing box
    val tiny = ftyp ++ be32(7) ++ "moov".getBytes ++ Array.fill[Byte](20)(0)
    assert(Mp4Codec.parseMp4(tiny).isEmpty) // walk stops, no mvhd seen
    // size 0xFFFFFFF8 — negative as Int, must not rewind
    val huge = ftyp ++ be32(0xFFFFFFF8L) ++ "moov".getBytes
    assert(Mp4Codec.parseMp4(huge).isEmpty)
    // size==1 with truncated largesize
    val trunc = ftyp ++ be32(1) ++ "moov".getBytes ++ Array[Byte](0, 0)
    assert(Mp4Codec.parseMp4(trunc).isEmpty)
    // size==1 with a largesize overrunning the payload
    val overrun = ftyp ++ be32(1) ++ "moov".getBytes ++ be64(1L << 60)
    assert(Mp4Codec.parseMp4(overrun).isEmpty)
    // a valid file whose LAST box declares size 0 (to end) still parses
    val tail0 = ftyp ++ box("moov", mvhdV0(600, 1234)) ++
      (be32(0) ++ "mdat".getBytes ++ Array.fill[Byte](9)(3))
    val m = Mp4Codec.parseMp4(tail0).get
    assert(m.timescale == 600L && m.durationUnits == 1234L && m.nTopBoxes == 3)
  }

  test("not-an-mp4 payloads return None") {
    assert(Mp4Codec.parseMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mp4Codec.parseMp4("RIFF1234WAVEfmt ".getBytes).isEmpty)
    // ftyp but no moov/mvhd anywhere
    assert(Mp4Codec.parseMp4(ftyp ++ box("mdat", Array.fill[Byte](4)(0))).isEmpty)
  }

  test("sample tables: hand-laid stbl under a v1 mvhd parses exactly") {
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      be32(16) ++ "hev1".getBytes ++ be64(0))
    val stts = box("stts", be32(0) ++ be32(2) ++
      be32(3) ++ be32(10) ++ be32(2) ++ be32(20)) // 3×10u + 2×20u
    val stss = box("stss", be32(0) ++ be32(2) ++ be32(1) ++ be32(4))
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1000) ++ be64(70L) ++
        Array.fill[Byte](112 - 32)(0))
    val bytes = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhdV0(320, 180) ++
      box("mdia", box("minf", box("stbl", stsd ++ stts ++ stss)))))
    val m = Mp4Codec.parseMp4Samples(bytes).get
    assert(m.timescale == 1000L && m.codec == "hev1")
    assert(m.sttsRuns == Seq((3L, 10L), (2L, 20L)) && m.nSamples == 5L)
    assert(m.syncSamples == Seq(1L, 4L))
    // demuxer placement: sample 4 sits after the first run's 3×10 units
    assert(m.unitsBefore(1L) == 0L && m.unitsBefore(4L) == 30L)
    assert(m.unitsBefore(5L) == 50L) // ... plus one 20-unit sample
  }

  test("truncated stbl: declared stts/stss counts are capped to the box body") {
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      be32(16) ++ "avc1".getBytes ++ be64(0))
    // stts CLAIMS 2^31 runs but carries one; stss claims 40, carries 2
    val stts = box("stts", be32(0) ++ be32(0x7fffffffL) ++ be32(6) ++ be32(10))
    val stss = box("stss", be32(0) ++ be32(40) ++ be32(1) ++ be32(4))
    val bytes = ftyp ++ box("moov", mvhdV0(600, 60) ++
      box("trak", tkhdV0(320, 180) ++
        box("mdia", box("minf", box("stbl", stsd ++ stts ++ stss)))))
    val m = Mp4Codec.parseMp4Samples(bytes).get
    assert(m.sttsRuns == Seq((6L, 10L)) && m.syncSamples == Seq(1L, 4L))
    // no stts anywhere: None, not a zeroed report
    val noStbl = ftyp ++ box("moov", mvhdV0(600, 60) ++ box("trak", tkhdV0(1, 1)))
    assert(Mp4Codec.parseMp4Samples(noStbl).isEmpty)
  }

  test("sampled writer → parser round-trip reads the tables from bytes") {
    val bytes = Mp4Codec.writeMp4Sampled(90000, 320, 180, "vp09",
      Seq((4, 900), (3, 1800)), Seq(1, 4, 7), Array.fill[Byte](9)(3))
    val m = Mp4Codec.parseMp4Samples(bytes).get
    assert(m.majorBrand == "isom" && m.timescale == 90000L && m.codec == "vp09")
    assert(m.nSamples == 7L && m.syncSamples == Seq(1L, 4L, 7L))
    assert(m.unitsBefore(7L) == 4 * 900L + 2 * 1800L)
    // the plain meta parser sees the same container: duration derived
    // from the runs lands in mvhd
    val meta = Mp4Codec.parseMp4(bytes).get
    assert(meta.durationUnits == 4 * 900L + 3 * 1800L)
    // no chunk tables → byte ranges unresolvable, never invented
    assert(m.byteRangeOf(1L).isEmpty)
  }

  test("chunk tables: byte ranges point at the ACTUAL sample bytes") {
    val sizes = Seq(3, 4, 5, 6, 7)
    val mdat = Array.tabulate(sizes.sum)(i => (i + 1).toByte)
    val bytes = Mp4Codec.writeMp4Sampled(1000, 320, 180, "avc1",
      Seq((3, 10), (2, 20)), Seq(1, 4), mdat, sizes)
    val m = Mp4Codec.parseMp4Samples(bytes).get
    assert(m.sizes == Seq(3L, 4L, 5L, 6L, 7L))
    assert(m.stscEntries == Seq((1L, 2L)))
    assert(m.chunkOffsets.length == 3) // ceil(5/2)
    // every sample's resolved range slices exactly its mdat bytes
    var pos = 0
    (1 to 5).foreach { i =>
      val (chunk, off, len) = m.byteRangeOf(i.toLong).get
      assert(chunk == (i + 1) / 2, s"sample $i chunk")
      assert(len == sizes(i - 1).toLong)
      val got = bytes.slice(off.toInt, off.toInt + len.toInt).toSeq
      assert(got == mdat.slice(pos, pos + sizes(i - 1)).toSeq,
        s"sample $i bytes at offset $off")
      pos += sizes(i - 1)
    }
    // out-of-range and hostile lookups refuse
    assert(m.byteRangeOf(0L).isEmpty && m.byteRangeOf(6L).isEmpty)
  }

  test("byte ranges tile the mdat: disjoint, ordered, and exhaustive") {
    // resolved ranges must cover every mdat byte exactly once — the
    // property a parallel range-fetcher relies on to never double-
    // read or skip payload bytes
    for (n <- Seq(2, 5, 9, 14)) {
      val sizes = (1 to n).map(i => 3 + ((i - 1) % 5))
      val mdat = Array.tabulate(sizes.sum)(i => (i % 97).toByte)
      val n1 = (n + 1) / 2
      val bytes = Mp4Codec.writeMp4Sampled(1000, 320, 180, "avc1",
        Seq((n1, 10), (n - n1, 20)).filter(_._1 > 0),
        (1 to n by 3).toSeq, mdat, sizes)
      val m = Mp4Codec.parseMp4Samples(bytes).get
      val ranges = (1 to n).map(i => m.byteRangeOf(i.toLong).get)
      // ordered + contiguous within the file
      ranges.sliding(2).foreach {
        case Seq((_, o1, l1), (_, o2, _)) => assert(o1 + l1 == o2)
        case _ => ()
      }
      // total coverage equals the mdat body
      assert(ranges.map(_._3).sum == mdat.length.toLong, s"n=$n coverage")
      // and the first range starts exactly at the mdat body
      val mdatHeaderAt = bytes.length - mdat.length - 8
      assert(ranges.head._2 == mdatHeaderAt + 8L, s"n=$n first offset")
    }
  }

  test("co64 (64-bit chunk offsets) reads like stco, wider entries") {
    // hand-laid stbl with co64 instead of stco — an offset above
    // 2^32 must come through intact (the >4 GiB file case)
    val bigOff = 0x1_2345_6789L
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      be32(16) ++ "avc1".getBytes ++ be64(0))
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(2) ++ be32(10))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(2) ++ be32(5) ++ be32(6))
    val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val co64 = box("co64", be32(0) ++ be32(1) ++ be64(bigOff))
    val bytes = ftyp ++ box("moov", mvhdV0(600, 20) ++
      box("trak", tkhdV0(320, 180) ++
        box("mdia", box("minf",
          box("stbl", stsd ++ stts ++ stsz ++ stsc ++ co64)))))
    val m = Mp4Codec.parseMp4Samples(bytes).get
    assert(m.chunkOffsets == Seq(bigOff))
    assert(m.byteRangeOf(1L).get == ((1L, bigOff, 5L)))
    assert(m.byteRangeOf(2L).get == ((1L, bigOff + 5L, 6L)))
  }

  test("multi-run stsc resolves chunks through the general walk") {
    // hand-laid: chunks 1-2 hold 3 samples each, chunks 3+ hold 1
    val stsc = Seq((1L, 3L), (3L, 1L))
    val m = Mp4Codec.Mp4Samples("isom", 1000, "avc1",
      Seq((8L, 10L)), Seq(1L),
      sizes = (1 to 8).map(_.toLong),
      stscEntries = stsc,
      chunkOffsets = Seq(100L, 200L, 300L, 400L))
    assert(m.byteRangeOf(1L).get == ((1L, 100L, 1L)))
    assert(m.byteRangeOf(3L).get == ((1L, 103L, 3L))) // 1+2 before it
    assert(m.byteRangeOf(4L).get == ((2L, 200L, 4L)))
    assert(m.byteRangeOf(7L).get == ((3L, 300L, 7L)))
    assert(m.byteRangeOf(8L).get == ((4L, 400L, 8L)))
    // chunk beyond the stco table: refused
    assert(m.byteRangeOf(9L).isEmpty)
    // hostile spc = 0: refused, no division
    val bad = m.copy(stscEntries = Seq((1L, 0L)))
    assert(bad.byteRangeOf(1L).isEmpty)
  }

  test("writer rejects durations that would wrap the v0 32-bit fields") {
    // r8 advice: a silent .toInt wrap would hash-fail the gate with
    // no diagnostic pointing at the writer — fail at fixture build
    intercept[IllegalArgumentException] {
      Mp4Codec.writeMp4(90000, 0x100000000L, 320, 180, Array.emptyByteArray)
    }
  }

  test("writer → parser round-trip reads fields from bytes, not arguments") {
    val bytes = Mp4Codec.writeMp4(1000, 80000L, 352, 288, Array.fill[Byte](17)(5))
    val m = Mp4Codec.parseMp4(bytes).get
    assert(m.majorBrand == "isom" && m.timescale == 1000L)
    assert(m.durationUnits == 80000L && m.durationMs == 80000L)
    assert(m.width == 352 && m.height == 288 && m.nTopBoxes == 3)
  }
}
