package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The simhash banding collision floor and its geometry-dial kill
  * (r7 verdict #2): 16-bit band keys admit ~n²·B/2¹⁶ RANDOM
  * candidate pairs on a corpus with NO near-dups at all — the
  * default geometry's quadratic floor — while 32-bit keys from the
  * 2×64-bit signature push the same corpus to ~zero candidates.
  * Recall stays: verbatim duplicates share every band under any
  * geometry, and the planted pair must survive the full hamming
  * verify under the wide dial. */
class SimhashFloorSpec extends SparkTestBase {
  import spark.implicits._

  /** n docs of 24 doc-unique pseudo-random tokens each: pairwise
    * token overlap is zero, so every cross-doc candidate is a pure
    * band-key collision. */
  private def randomCorpus(n: Int) =
    spark.range(n).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 24).map(t =>
        concat(lit("tok"), conv(concat_ws("x", $"id", lit(t)), 10, 16),
          md5(concat_ws(":", $"id", lit(t))))): _*).as("text"))

  private def withGeometry[T](g: Option[(Int, Int, Int)])(body: => T): T = {
    val prev = DedupOps.overrideSimhashGeometry
    DedupOps.overrideSimhashGeometry = g
    try body finally DedupOps.overrideSimhashGeometry = prev
  }

  private def candidateCount(n: Int, g: (Int, Int, Int)): Long =
    withGeometry(Some(g)) {
      DedupOps.simhashCandidates(
        DedupOps.simhashSigs(randomCorpus(n)).localCheckpoint(true)).count()
    }

  test("default 16-bit bands sit on the n²/2¹⁶ random floor; 32-bit bands kill it") {
    val n = 3000
    // E[default] = B·C(n,2)/2¹⁶ ≈ 4·4.5e6/65536 ≈ 275 — assert the
    // floor EXISTS (an order of magnitude above linear noise)
    val narrow = candidateCount(n, (1, 16, 6))
    assert(narrow > 50L,
      s"expected the 16-bit random-collision floor to show, got $narrow")
    // E[wide] = 4·C(n,2)/2³² ≈ 0.004 — the same corpus, ~zero
    val wide = candidateCount(n, (2, 32, 12))
    assert(wide <= 2L,
      s"32-bit bands should admit ~zero random collisions, got $wide")
  }

  test("floor grows quadratically with n under the default geometry") {
    val a = candidateCount(1500, (1, 16, 6))
    val b = candidateCount(3000, (1, 16, 6))
    // doubling n quadruples C(n,2); allow wide slack for variance
    assert(b > 2L * a, s"floor should grow superlinearly: n=1500 -> $a, n=3000 -> $b")
  }

  test("wide geometry keeps recall: planted verbatim dups verify at hamming 0") {
    val base = randomCorpus(200)
    val dups = base.where($"doc_id" % 10 === 3)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val corpus = base.unionByName(dups).localCheckpoint(true)
    withGeometry(Some((2, 32, 12))) {
      val sigs = DedupOps.simhashSigs(corpus).localCheckpoint(true)
      val cands = DedupOps.simhashCandidates(sigs)
      // every planted pair is a candidate (verbatim ⇒ all bands equal)
      val planted = cands
        .where($"doc_b" - $"doc_a" === 100000L && $"doc_a" % 10 === 3)
        .count()
      assert(planted == 20L, s"expected all 20 planted pairs admitted, got $planted")
      // and the full-signature hamming of a verbatim pair is 0 on
      // BOTH words (sig equality), so the verify stage keeps them
      val a = sigs.select($"doc_id".as("doc_a"), $"sig0".as("a0"), $"sig1".as("a1"))
      val b = sigs.select($"doc_id".as("doc_b"), $"sig0".as("b0"), $"sig1".as("b1"))
      val surviving = cands.join(a, "doc_a").join(b, "doc_b")
        .where($"doc_b" - $"doc_a" === 100000L &&
          bit_count($"a0".bitwiseXOR($"b0")) + bit_count($"a1".bitwiseXOR($"b1")) <= 12)
        .count()
      assert(surviving == 20L, s"planted pairs must survive the hamming verify, got $surviving")
    }
  }
}
