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

  test("text_bpe_encode: conservation, bounds, and a hand-checked encode") {
    import spark.implicits._
    // same crafted corpus as the training test — merges are known:
    // 1:(x,x)->xx  2:(a,b)->ab  3:(xx,xx)->xxxx
    // doc 0: each "xxxx" word is 4 chars -> [xx,xx] -> [xxxx] = 1 sym
    // doc 1: each "ab" word is 2 chars -> [ab] = 1 sym
    val docs = Seq(
      (0L, "xxxx xxxx xxxx"),
      (1L, "ab ab ab ab ab")).toDF("doc_id", "text")
    val got = BpeOps.textBpeEncode(spark, docsDir(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 3L, 12L, 3L, 9L), (1L, 5L, 10L, 5L, 5L)),
      s"hand encode mismatch: ${got.toSeq}")

    // real corpus: token count never exceeds char count, merges fired
    val real = BpeOps.textBpeEncode(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (nChars, nToks, nMerges) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nToks >= 1 && nToks <= nChars, s"doc ${r.getLong(0)}: $nToks vs $nChars")
      assert(nMerges == nChars - nToks)
    }
    assert(real.map(_.getLong(4)).sum > 0, "no merge ever fired on the real corpus")
  }

  /** Write a docs frame to a temp dir so dir-based query fns accept it. */
  private def docsDir(docs: DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("bpe-docs").toString
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(docs("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
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
