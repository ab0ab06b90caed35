package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the n-aware band-geometry schedule (r10 verdict #2:
  * the wide dials were measured safe but a HUMAN had to export them
  * one decade before the candidate-mass guard tripped — now the
  * hyperplane families choose geometry from the measured corpus
  * size, env dials demoted to overrides). */
class GeometryScheduleSpec extends AnyFunSuite {
  import AnnOps.{scheduledGeometry, ScheduleBands, ScheduleMinN}

  test("gate-scale corpora keep the family defaults (hash stability)") {
    // every driver-gate corpus (sf0.001/sf0.01: 500 vecs; sf0.1:
    // 2000) sits under the threshold, so the engine's choice equals
    // the static accessors the DuckDB oracles interpolate
    for (n <- Seq(1L, 500L, 2000L, ScheduleMinN - 1)) {
      assert(scheduledGeometry(n, (16, 8)) == ((16, 8)))
      assert(scheduledGeometry(n, (48, 4)) == ((48, 4)))
    }
  }

  test("bits widen monotonically with n; one word until the multi-word tier") {
    val ns = Seq(ScheduleMinN, 20000L, 80000L, 196608L)
    val bits = ns.map(n => scheduledGeometry(n, (16, 8))._2)
    assert(bits == bits.sorted, s"bandBits must be monotone in n: $bits")
    assert(bits.head >= 12 && bits.last == 16)
    ns.foreach { n =>
      val (p, b) = scheduledGeometry(n, (16, 8))
      assert(p % b == 0 && p / b == ScheduleBands, "4 bands, planes = bands*bits")
      assert(p <= 64, "one replayable BIGINT word below the multi-word tier")
    }
  }

  test("past the one-word cap the schedule goes MULTI-WORD, never sheds " +
      "(r11 what's-missing #2)") {
    import AnnOps.{MultiWordPlanes, MultiWordBandBits}
    // 4×16-bit one-word bands up to n ~ 196k (12·2^16/n >= 4); r11
    // shed bands there (recall 0.93 → 0.86 → 0.73 at cos 0.99) —
    // now the 5-word, ten-32-bit-band signature takes over instead
    assert(scheduledGeometry(20000L, (48, 4)) == ((64, 16)))
    assert(scheduledGeometry(196608L, (48, 4)) == ((64, 16)))
    for (n <- Seq(200000L, 2000000L, 2000000000L))
      assert(scheduledGeometry(n, (48, 4)) ==
        ((MultiWordPlanes, MultiWordBandBits)))
    // the multi-word dial passes the same validation as a pinned one
    AnnOps.requireHyperplaneGeometry(MultiWordPlanes, MultiWordBandBits, "spec")
    // multi-word recall at cos 0.99 is RESTORED >= 0.9 analytically:
    // some-band collision 1-(1-p^32)^10 with p = 1 - acos(0.99)/pi
    val p = 1.0 - math.acos(0.99) / math.Pi
    val bands = MultiWordPlanes / MultiWordBandBits
    val recall = 1.0 - math.pow(1.0 - math.pow(p, MultiWordBandBits), bands)
    assert(recall >= 0.9, s"analytic multi-word recall at cos 0.99: $recall")
  }

  test("scheduled random-collision floor stays orders under the mass guard") {
    // per-item random floor = bands/2^bits of the corpus; the stress
    // guard's ceiling is 0.5% of corpus per item (CAND_FRAC) — the
    // schedule keeps the floor >= 40x under it at every n
    for (n <- Seq(ScheduleMinN, 20000L, 200000L, 2000000L, 200000000L)) {
      val (p, b) = scheduledGeometry(n, (16, 8))
      val floorFrac = (p / b).toDouble / (1L << b)
      assert(floorFrac <= 0.005 / 40,
        s"n=$n bits=$b floorFrac=$floorFrac")
      // and below the one-word cap the ABSOLUTE floor is ~1
      // candidate/item; at the multi-word tier it is ~2/item even at
      // n = 10^9 (10 bands / 2^32)
      if (b < 16)
        assert(n.toDouble * ScheduleBands / (1L << b) <= 2.0,
          s"n=$n bits=$b: uncapped floor must be <= ~1/item")
      if (b == 32)
        assert(n.toDouble * (p / b) / (1L << 32).toDouble <= 2.0,
          s"n=$n multi-word floor must stay <= ~2/item")
    }
  }

  test("Hamming families: default below threshold, doubled signature above") {
    import AnnOps.{scheduledHammingGeometry, HammingMinN}
    for (n <- Seq(1L, 500L, 5000L, HammingMinN - 1)) {
      assert(scheduledHammingGeometry(n, (1, 16, 6)) == ((1, 16, 6)))
      assert(scheduledHammingGeometry(n, (1, 16, 12)) == ((1, 16, 12)))
    }
    // above: 2x words, 32-bit bands, tau scaled with the signature
    // (same flipped-bit fraction bar) — the measured-safe wide dials
    assert(scheduledHammingGeometry(HammingMinN, (1, 16, 6)) == ((2, 32, 12)))
    assert(scheduledHammingGeometry(500000L, (1, 16, 12)) == ((2, 32, 24)))
    // the switch point is where the default's random floor passes
    // ~2 candidates/item: n*bands/2^16 = 2 at n = 32768
    assert(HammingMinN * 4.0 / (1 << 16) == 2.0)
  }

  test("a pinned dial (override or env) always wins over the schedule") {
    val s = graft.SparkTestBase.session
    AnnOps.overrideLshGeometry = Some((64, 16))
    DedupOps.overrideEmbGeometry = Some((64, 16))
    try {
      assert(AnnOps.lshGeometryFor(s, "/root/testdata/sf0.001") == ((64, 16)))
      assert(DedupOps.embGeometryFor(s, "/root/testdata/sf0.001") == ((64, 16)))
    } finally {
      AnnOps.overrideLshGeometry = None
      DedupOps.overrideEmbGeometry = None
    }
    // unpinned at gate scale (500 vecs): the defaults — the oracle's
    // static interpolation and the engine agree
    assert(AnnOps.lshGeometryFor(s, "/root/testdata/sf0.001") == ((48, 4)))
    assert(DedupOps.embGeometryFor(s, "/root/testdata/sf0.001") == ((16, 8)))
  }
}
