package graft.operators

import graft.SparkTestBase

/** Oracles for the power-iteration PCA beyond the DuckDB gate: a
  * local single-threaded replica of the same algorithm (the
  * distributed decimal-exact sums must land on the same component a
  * plain in-memory fold finds), Rayleigh-quotient monotonicity, and
  * run-to-run determinism of the gated query. */
class PcaSpec extends SparkTestBase {

  private def localFit(iters: Int): (Array[Double], Array[Double], Double) = {
    import spark.implicits._
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select($"embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = rows.length
    val dim = rows.head.length
    val mu = new Array[Double](dim)
    rows.foreach(r => (0 until dim).foreach(d => mu(d) += r(d)))
    (0 until dim).foreach(d => mu(d) /= n)
    val ce = rows.map(r => r.indices.map(d => r(d) - mu(d)).toArray)
    var v = Array.fill(dim)(0.125)
    var eig = 0.0
    for (_ <- 1 to iters) {
      val w = new Array[Double](dim)
      ce.foreach { c =>
        var s = 0.0
        var d = 0
        while (d < dim) { s += c(d) * v(d); d += 1 }
        d = 0
        while (d < dim) { w(d) += s * c(d); d += 1 }
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      eig = nrm / (n - 1)
      v = w.map(_ / nrm)
    }
    (mu, v, eig)
  }

  test("emb_pca_power: distributed fit matches a local replica of the same algorithm") {
    val (muD, vD, eigD) = PcaOps.fit(spark, sfDir)
    val (muL, vL, eigL) = localFit(PcaOps.Iters)
    muD.zip(muL).foreach { case (a, b) => assert(math.abs(a - b) < 1e-7) }
    // decimal(…,10) quantization per term bounds the drift far below 1e-6
    vD.zip(vL).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    assert(math.abs(eigD - eigL) < 1e-6)
    val norm = math.sqrt(vD.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12, s"component not unit norm: $norm")
  }

  test("emb_pca_power: Rayleigh quotient is non-decreasing with more rounds") {
    val (_, _, e3) = PcaOps.fit(spark, sfDir, iters = 3)
    val (_, _, e6) = PcaOps.fit(spark, sfDir, iters = 6)
    assert(e6 >= e3 - 1e-9, s"power iteration regressed: $e3 -> $e6")
  }

  test("emb_pca_power: gated query is deterministic and bounded") {
    val a = PcaOps.embPcaPower(spark, sfDir).collect()
    val b = PcaOps.embPcaPower(spark, sfDir).collect()
    assert(a.length == PcaOps.TopN)
    assert(a.toSeq == b.toSeq)
  }
}
