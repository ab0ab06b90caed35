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

  test("bits widen monotonically with n and cap at a one-word signature") {
    val ns = Seq(ScheduleMinN, 20000L, 80000L, 200000L, 2000000L, 2000000000L)
    val bits = ns.map(n => scheduledGeometry(n, (16, 8))._2)
    assert(bits == bits.sorted, s"bandBits must be monotone in n: $bits")
    assert(bits.head >= 12 && bits.last == 16)
    ns.foreach { n =>
      val (p, b) = scheduledGeometry(n, (16, 8))
      assert(p % b == 0 && p / b >= 2 && p / b <= ScheduleBands,
        "2..4 bands, planes = bands*bits")
      assert(p <= 64, "signature must stay one replayable BIGINT word")
    }
  }

  test("past the bits cap the schedule sheds bands, never a human") {
    // 4 bands up to n ~ 196k (12·2^16/n >= 4), then 3, floor 2 —
    // the sf10 stress decade (200k vecs) measured 4 bands exactly ON
    // the 0.5% mass guard; 3 bands is what keeps it under
    assert(scheduledGeometry(20000L, (48, 4)) == ((64, 16)))
    assert(scheduledGeometry(196608L, (48, 4)) == ((64, 16)))
    assert(scheduledGeometry(200000L, (48, 4)) == ((48, 16)))
    assert(scheduledGeometry(2000000L, (48, 4)) == ((32, 16)))
    assert(scheduledGeometry(2000000000L, (48, 4)) == ((32, 16)))
    // band count is monotone non-increasing in n
    val bands = Seq(10000L, 50000L, 150000L, 300000L, 1000000L, 5000000L)
      .map(n => { val (p, b) = scheduledGeometry(n, (48, 4)); p / b })
    assert(bands == bands.sorted.reverse, s"bands must shed with n: $bands")
  }

  test("scheduled random-collision floor stays orders under the mass guard") {
    // per-item random floor = bands/2^bits of the corpus; the stress
    // guard's ceiling is 0.5% of corpus per item (CAND_FRAC) — the
    // schedule keeps the floor >= 40x under it at every n
    for (n <- Seq(ScheduleMinN, 20000L, 200000L, 2000000L, 200000000L)) {
      val (_, b) = scheduledGeometry(n, (16, 8))
      val floorFrac = ScheduleBands.toDouble / (1L << b)
      assert(floorFrac <= 0.005 / 40,
        s"n=$n bits=$b floorFrac=$floorFrac")
      // and below the cap the ABSOLUTE floor is ~1 candidate/item
      if (b < 16)
        assert(n.toDouble * ScheduleBands / (1L << b) <= 2.0,
          s"n=$n bits=$b: uncapped floor must be <= ~1/item")
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
