package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SuffixSpec extends SparkTestBase {

  test("exact pass coverage == windowed pass on the (collision-free) sf corpus") {
    // proven equivalence: token t lies in a duplicated substring of
    // length ≥ L iff t lies in a duplicated exact L-window, so
    // covered/n_spans agree whenever no window hash collides. A
    // divergence here would mean either an FNV collision (windowed
    // overcounts) or a suffix-array bug.
    import spark.implicits._
    val exact = SuffixOps.qDedupExactSubstr(spark, sfDir)
      .select($"doc_id", $"n_spans", $"covered")
      .as[(Long, Long, Long)].collect().map { case (d, s, c) => d -> (s, c) }.toMap
    val windowed = CurationOps.dedupSpanCoverage(spark, sfDir)
      .select($"doc_id", $"n_spans", $"covered")
      .as[(Long, Long, Long)].collect().map { case (d, s, c) => d -> (s, c) }.toMap
    assert(exact.nonEmpty, "no duplicated spans found at all")
    assert(exact == windowed,
      s"exact vs windowed diverged: ${(exact.toSet diff windowed.toSet).take(3)}")
  }

  test("windowed pass cannot see chimera spans; the exact pass can") {
    // doc 10 = A ++ B (two 8-token runs); A repeats in doc 20, B in
    // doc 30 — doc 10's 16 tokens are all covered, but NO 16-token
    // substring of doc 10 occurs twice anywhere (a chimera). doc 40
    // and doc 50 share a TRUE 16-token duplicate. The windowed pass
    // reports identical accounting for doc 10 and doc 40 (one span,
    // 16 covered) — it provably cannot distinguish them. max_dup_len
    // separates them: 8 for the chimera, 16 for the true repeat.
    import spark.implicits._
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val B = (1 to 8).map(i => s"b$i").mkString(" ")
    val T = (1 to 16).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (10L, s"$A $B"), (20L, s"$A x1 x2 x3"), (30L, s"y1 y2 y3 $B"),
      (40L, T), (50L, s"$T z9")).toDF("doc_id", "text")

    val exact = SuffixOps.exactSpans(docs)
      .select($"doc_id", $"n_spans", $"covered", $"max_dup_len")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    assert(exact(10L) == ((1L, 16L, 8L)),
      s"chimera doc: one covered span of 16 but max true repeat 8, got ${exact(10L)}")
    assert(exact(40L) == ((1L, 16L, 16L)),
      s"true 16-token repeat, got ${exact(40L)}")

    // the windowed pass sees doc 10 and doc 40 identically
    val wins = docs
      .select($"doc_id", graft.functions.Cols.normTokens($"text").as("tk"))
      .select($"doc_id",
        graft.functions.VectorExpressions.fnv_shingles($"tk", CurationOps.SpanW).as("hs"))
      .select($"doc_id", posexplode($"hs").as(Seq("st", "h")))
    val dupHashes = wins.groupBy($"h").agg(count(lit(1)).as("c")).where($"c" >= 2)
    val dupWins = wins.join(dupHashes, "h")
      .groupBy($"doc_id").agg(min($"st").as("lo"), max($"st").as("hi"))
      .select($"doc_id", ($"hi" - $"lo" + CurationOps.SpanW).as("span_extent"))
      .as[(Long, Long)].collect().toMap
    assert(dupWins(10L) == dupWins(40L) && dupWins(10L) == 16L,
      s"windowed extent should read 16 for BOTH docs: $dupWins")
  }

  test("max_dup_len equals full doc length for planted full-doc duplicates") {
    import spark.implicits._
    val full = SuffixOps.qDedupExactSubstr(spark, sfDir)
      .where($"coverage" === 1.0 && $"n_spans" === 1)
      .select($"doc_id", $"n_tokens", $"max_dup_len")
      .as[(Long, Long, Long)].collect()
    assert(full.nonEmpty, "sf corpus plants full-doc duplicates")
    // a fully-covered single-span doc whose span is one true repeat
    // must report max_dup_len == n_tokens (or n_tokens-1 when the
    // doc's copy diverges in its last token); at minimum ≥ MinDup
    full.foreach { case (d, n, m) =>
      assert(m >= SuffixOps.MinDup && m <= n, s"doc $d: m=$m n=$n")
    }
    assert(full.exists { case (_, n, m) => m == n },
      "at least one exact full-doc duplicate expected")
  }
}
