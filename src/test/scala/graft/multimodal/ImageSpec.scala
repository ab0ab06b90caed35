package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkTestBase

/** The REAL ImageIO codec against hand-computed values and real
  * re-encoded bytes: round-trip exactness for lossless containers,
  * reader-sniffed format names, and aHash recall across an actual
  * JPEG quality loss — the de-stub proof for the image half of the
  * multimodal stack (the WavSpec discipline, applied to pixels).
  */
class ImageSpec extends SparkTestBase {

  test("png/bmp round-trip: decoded dims, format, and exact pixel sum") {
    for ((fmt, id, w, h) <- Seq(("png", 5L, 13, 9), ("bmp", 70L, 8, 31))) {
      val bytes = ImageCodec.encode(ImageCodec.renderGray(id, w, h), fmt)
      val d = ImageCodec.decode(bytes).get
      assert(d.format == fmt && d.width == w && d.height == h)
      // closed form: h*w(w-1)/2 + w*h(h-1)/2 + w*h*(id%64), hand-checkable
      val expect = h.toLong * w * (w - 1) / 2 + w.toLong * h * (h - 1) / 2 +
        w.toLong * h * (id % 64)
      assert(ImageCodec.sumLuma(d.image) == expect,
        s"$fmt raster not lossless: ${ImageCodec.sumLuma(d.image)} vs $expect")
    }
  }

  test("jpeg decodes with exact dims and reader-sniffed format; raster is close") {
    val img = ImageCodec.renderGray(17L, 40, 24)
    val d = ImageCodec.decode(ImageCodec.encode(img, "jpeg")).get
    assert(d.format == "jpeg" && d.width == 40 && d.height == 24)
    val orig = ImageCodec.sumLuma(img).toDouble
    val got = ImageCodec.sumLuma(d.image).toDouble
    assert(math.abs(got - orig) / orig < 0.05,
      s"jpeg luma sum drifted ${got / orig}x — decoder reading wrong pixels?")
  }

  test("garbage and truncated payloads decode to None, never throw") {
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(Array[Byte](0x89.toByte, 'P', 'N', 'G')).isEmpty)
    val png = ImageCodec.encode(ImageCodec.renderGray(1L, 16, 16), "png")
    assert(ImageCodec.decode(png.take(20)).isEmpty, "truncated PNG must be None")
  }

  /** Blocky random test image: 8×8 random-bit cells upscaled — the
    * structure class aHash is built for (smooth gradients hash to the
    * same value by design; real photos have cell contrast). */
  private def blocky(seed: Long, size: Int = 64): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val cells = Array.fill(64)(if (rnd.nextBoolean()) 230 else 25)
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val v = cells((y * 8 / size) * 8 + (x * 8 / size))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("boxDownsample: exact integer means, crop-to-multiple, closed-form luma") {
    val id = 37L
    val img = ImageCodec.renderGray(id, 21, 15) // odd dims: crop to 20x14
    val small = ImageCodec.boxDownsample(img, 2)
    assert(small.getWidth == 10 && small.getHeight == 7)
    // out(X,Y) = 2X + 2Y + (id%64) + 1 — check a few cells directly
    for ((x, y) <- Seq((0, 0), (9, 6), (4, 3))) {
      val v = (small.getRGB(x, y) >> 16) & 0xff
      assert(v == 2 * x + 2 * y + (id % 64).toInt + 1, s"cell ($x,$y)")
    }
    // closed-form thumbnail luma sum (the mm_image_resize oracle form)
    val (ow, oh, b) = (10L, 7L, id % 64)
    assert(ImageCodec.sumLuma(small) ==
      oh * ow * (ow - 1) + ow * oh * (oh - 1) + ow * oh * (b + 1))
    // round-trip through a lossless container preserves it
    val d2 = ImageCodec.decode(ImageCodec.encode(small, "png")).get
    assert(ImageCodec.sumLuma(d2.image) == ImageCodec.sumLuma(small))
    // a factor that exceeds the image refuses loudly
    intercept[IllegalArgumentException] {
      ImageCodec.boxDownsample(ImageCodec.renderGray(1L, 3, 3), 4)
    }
  }

  test("aHash recall on REAL re-encoded images: jpeg copies within tau, strangers far") {
    val n = 30
    val base = (0 until n).map(i => ImageCodec.aHash(blocky(1000L + i)))
    // re-encode each through lossy JPEG, decode the real bytes, re-hash
    val reenc = (0 until n).map { i =>
      val bytes = ImageCodec.encode(blocky(1000L + i), "jpeg")
      ImageCodec.aHash(ImageCodec.decode(bytes).get.image)
    }
    val tau = graft.operators.TextOps.PhashTau
    val recalled = (0 until n).count(i =>
      ImageCodec.hamming(base(i), reenc(i)) <= tau)
    assert(recalled == n,
      s"aHash recall $recalled/$n at hamming<=$tau across a real JPEG re-encode")
    // strangers: distinct random images should sit near 32/64 bits apart
    val cross = for (i <- 0 until n; j <- i + 1 until n)
      yield ImageCodec.hamming(base(i), base(j))
    assert(cross.count(_ <= tau) <= cross.size / 20,
      "unrelated images colliding under the phash threshold")
  }

  test("aHash also survives a BMP->PNG container swap bit-for-bit") {
    val img = blocky(7L)
    val viaBmp = ImageCodec.decode(ImageCodec.encode(img, "bmp")).get.image
    val viaPng = ImageCodec.decode(ImageCodec.encode(img, "png")).get.image
    assert(ImageCodec.aHash(viaBmp) == ImageCodec.aHash(viaPng))
    assert(ImageCodec.aHash(viaBmp) == ImageCodec.aHash(img))
  }

  test("mm_image_meta: decoded columns equal the generation closed form") {
    import spark.implicits._
    val out = graft.operators.TextOps.mmImageMeta(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Option[Long])].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, fmt, w, h, np, sum) =>
      assert(h == 8 + (id % 24) && np == w * h)
      assert(fmt == Seq("png", "bmp", "jpeg")((id % 3).toInt))
      if (fmt == "jpeg") assert(sum.isEmpty)
      else assert(sum.contains(
        h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2) + w * h * (id % 64)))
    }
  }
}
