package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-replayable Bloom's own contracts, independent of the
  * decontamination queries that consume it. */
class FnvBloomSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(0xB100DL)
  private def word(): String =
    (1 to 3 + rng.nextInt(8)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("zero false negatives over 10k random adds") {
    val bf = new FnvBloom(1 << 18, 7)
    val added = Vector.fill(10000)(word())
    added.foreach(bf.add)
    added.foreach(w => assert(bf.mightContain(w), s"false negative: $w"))
  }

  test("false-positive rate stays near the load-factor formula") {
    val m = 1 << 18
    val k = 7
    val bf = new FnvBloom(m, k)
    val added = (1 to 10000).map(i => s"in-$i-${word()}")
    added.foreach(bf.add)
    val probes = (1 to 20000).map(i => s"out-$i-${word()}")
    val fp = probes.count(bf.mightContain).toDouble / probes.size
    // theoretical fpp = (1 - e^(-kn/m))^k ~ 0.0006 at this load; a
    // broken probe function shows up orders of magnitude above it
    assert(fp < 0.01, s"fp rate $fp — double-hash probes broken?")
  }

  test("merge is the distributed build: OR of partition filters == sequential filter") {
    val a = new FnvBloom(1 << 12, 5)
    val b = new FnvBloom(1 << 12, 5)
    val seq = new FnvBloom(1 << 12, 5)
    val (wa, wb) = (Vector.fill(300)(word()), Vector.fill(300)(word()))
    wa.foreach { w => a.add(w); seq.add(w) }
    wb.foreach { w => b.add(w); seq.add(w) }
    val merged = a.merge(b)
    assert(merged.setBitCount == seq.setBitCount)
    (wa ++ wb).foreach(w => assert(merged.mightContain(w)))
  }

  test("geometry mismatch refuses to merge; non-power-of-two size refuses to build") {
    intercept[IllegalArgumentException](new FnvBloom(1000, 7))
    intercept[IllegalArgumentException](
      new FnvBloom(1 << 12, 5).merge(new FnvBloom(1 << 13, 5)))
  }
}
