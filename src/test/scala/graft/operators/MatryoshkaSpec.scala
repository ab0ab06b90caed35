package graft.operators

import graft.SparkTestBase

/** [[AnnOps.embMatryoshkaEval]] invariants on the real corpus: the
  * full-width row must be a perfect self-match (recall 1.0 — the
  * panel's built-in calibration anchor), recall must not DECREASE
  * as the prefix widens (more information can't hurt an exact
  * ranking's overlap with the full-width truth on this panel), and
  * mean full-dim similarity of the truncated winners must peak at
  * full width (the full-width top-k maximizes its own metric). */
class MatryoshkaSpec extends SparkTestBase {
  import spark.implicits._

  test("full width is exact; recall and winner quality rise with width") {
    val rows = AnnOps.embMatryoshkaEval(spark, sfDir)
      .select($"dim", $"recall", $"mean_full_sim")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == AnnOps.MatryoshkaDims.map(_.toLong))
    assert(rows.last._2 == 1.0, s"full-width recall must be 1.0: ${rows.last}")
    // the panel's reason to exist: truncation must actually cost
    // something on this corpus, or the numbers are vacuous
    assert(rows.head._2 < 1.0, "8-dim recall 1.0 is not plausible here")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2, s"recall fell with width: $lo -> $hi")
    }
    // full-width winners maximize mean full-dim similarity
    assert(rows.map(_._3).max == rows.last._3,
      s"full width must have the best winner quality: ${rows.toSeq}")
  }
}
