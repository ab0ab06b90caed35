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

  test("LCPs deeper than the first compare cap resolve exactly (×4 escalation)") {
    // a shared 300-token run forces ≥ 2 bounded-compare rounds
    // (CmpCap0=64 → 256 → 1024); the docs diverge AFTER the run so
    // the rank-equal shortcut can't close the pair — the escalation
    // path itself must produce lcp=300
    import spark.implicits._
    assert(SuffixOps.CmpCap0 < 300)
    val run = (1 to 300).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run u1 u2 u3"), (2L, s"$run v1 v2 v3")).toDF("doc_id", "text")
    val spans = SuffixOps.exactSpans(docs)
      .select($"doc_id", $"covered", $"max_dup_len")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(spans(1L) == ((300L, 300L)), s"escalated LCP wrong: ${spans(1L)}")
    assert(spans(2L) == ((300L, 300L)), s"escalated LCP wrong: ${spans(2L)}")
  }

  test("no exchange ships full token arrays next to suffix pairs") {
    // the r5 defect: the pair frame carried whole per-doc token
    // arrays through the second token join's shuffle — O(positions ×
    // docLen) bytes. The bounded compare slices map-side, so an
    // Exchange whose output holds a pair key (sn) must never also
    // hold a full-array column (tka/tkb); full arrays may only cross
    // corpus-side exchanges (da/tka alone).
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d x y z w"))
      .toDF("doc_id", "text")
    val docTk = docs.select($"doc_id",
      graft.functions.Cols.normTokens($"text").as("tk"))
    val pend = Seq((1L, 1L, 0L, 8L, 2L, 0L, 8L)).toDF(
      "sn", "da", "pa", "la", "db", "pb", "lb")
    val cmp = SuffixOps.boundedCompare(
      pend,
      docTk.select($"doc_id".as("da"), $"tk".as("tka")),
      docTk.select($"doc_id".as("db"), $"tk".as("tkb")),
      cap = 64L)
    val bad = cmp.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.output.exists(_.name == "sn") &&
            e.output.exists(a => a.name == "tka" || a.name == "tkb") => e
    }
    assert(bad.isEmpty,
      s"pair-keyed exchange still carries full token arrays:\n${bad.headOption}")
    // and the compare itself is right: first mismatch at position 5
    val row = cmp.select($"mm", $"cmp").head()
    assert(row.getLong(0) == 5 && row.getLong(1) == 8)
  }

  test("journey cap: heavy user analyzed on first-cap prefix, organic users unchanged") {
    import spark.implicits._
    // heavy user 1: a 10-step loop repeated 30× (300 events); organic
    // user 2: 20 events. cap=40 truncates user 1 only.
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(u: Long, i: Int, t: String) =
      (u, new java.sql.Timestamp(base.getTime + i * 1000L), i.toLong, t)
    val heavy = (0 until 300).map(i => ev(1L, i, s"e${i % 10}"))
    val organic = (0 until 20).map(i => ev(2L, i, s"e${i % 7}"))
    val events = (heavy ++ organic)
      .toDF("user_id", "ts", "event_id", "event_type")
    val capped = SuffixOps.journeySeqs(events, cap = 40)
      .as[(Long, String)].collect().toMap
    assert(capped(1L).split(" ").length == 40, "heavy user not truncated")
    val uncapped = SuffixOps.journeySeqs(events)
      .as[(Long, String)].collect().toMap
    assert(capped(2L) == uncapped(2L), "organic user affected by the cap")
    // truncation keeps a PREFIX in event order, so the kept 40 steps
    // are the loop's first 4 cycles verbatim
    val expect = (0 until 40).map(i => s"e${i % 10}").mkString(" ")
    assert(capped(1L) == expect)
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
