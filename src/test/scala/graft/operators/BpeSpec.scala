package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Hand-oracle for BPE merge training: a corpus crafted so the
  * argmax chain and the greedy-overlap semantics ("aaa" merges once,
  * not twice, under pair (a,a)) are derivable by hand, plus
  * determinism of the gated query on real data. */
class BpeSpec extends SparkTestBase {

  private def train(df: DataFrame): Seq[(Long, String, String, String, Long)] =
    BpeOps.trainMerges(df)

  test("bpe: hand-derivable merge chain with greedy-overlap semantics") {
    import spark.implicits._
    // "xxxx" ×3: pair (x,x) counts 3 slots/word ×3 words = 9.
    // After merging (x,x) greedily, "xxxx" -> [xx, xx] (NOT [xx,x,x]):
    // round 2 must therefore see (xx,xx) with count 3.
    // "ab" ×5 contributes (a,b)=5 — beats nothing in round 1 (9 > 5),
    // wins round 2 only if (xx,xx)=3 < 5. Round 3 then takes (xx,xx).
    val docs = Seq(
      (0L, "xxxx xxxx xxxx"),
      (1L, "ab ab ab ab ab")).toDF("doc_id", "text")
    val got = train(docs)
    assert(got(0) == ((1L, "x", "x", "xx", 9L)), s"round1: ${got(0)}")
    assert(got(1) == ((2L, "a", "b", "ab", 5L)), s"round2: ${got(1)}")
    assert(got(2) == ((3L, "xx", "xx", "xxxx", 3L)), s"round3: ${got(2)}")
  }

  test("text_bpe_train: deterministic on the real corpus") {
    val a = BpeOps.textBpeTrain(spark, sfDir).collect()
    val b = BpeOps.textBpeTrain(spark, sfDir).collect()
    assert(a.length == BpeOps.Rounds)
    assert(a.toSeq == b.toSeq)
    // merged symbol is always lhs ++ rhs
    a.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
  }
}
