package graft.operators

import graft.SparkTestBase

/** Property-style stress of the suffix machinery's DISTRIBUTED
  * seams — partition-boundary folds, tie-heavy suffix orders, the
  * fixpoint exit — against an O(n²) in-memory brute force, on
  * deterministic pseudo-random corpora built from a 4-token
  * vocabulary (tiny vocab ⟹ massive repetition ⟹ every tie and
  * every segmented-scan reset path gets exercised; the r5 review
  * caught exactly one such boundary bug, so these seams get a
  * standing guard). */
class SuffixPropSpec extends SparkTestBase {

  private val vocab = Array("aa", "bb", "cc", "dd")

  /** xorshift-ish deterministic generator — NOT java Random, so the
    * corpus is stable across JVMs. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    var x = seed | 1
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x & Long.MaxValue }
    (0 until nDocs).map { d =>
      val len = 3 + (next() % 28).toInt
      val toks = (0 until len).map(_ => vocab((next() % vocab.length).toInt))
      (d.toLong, toks.mkString(" "))
    }
  }

  private def lcp(a: Seq[String], b: Seq[String]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  private def spansOf(ivs: Seq[(Int, Int)]): Seq[(Int, Int)] =
    ivs.sortBy(_._1).foldLeft(List.empty[(Int, Int)]) {
      case (acc, (st, en)) => acc match {
        case (ps, pe) :: tail if st <= pe => (ps, math.max(pe, en)) :: tail
        case _ => (st, en) :: acc
      }
    }.reverse

  test("exactSpans == O(n²) brute force on tie-heavy random corpora") {
    import spark.implicits._
    for (seed <- Seq(7L, 101L, 3571L)) {
      val docs = corpus(seed, 24)
      val toks = docs.map { case (d, t) => d -> t.split(" ").toSeq }.toMap
      val sufs = toks.toSeq.flatMap { case (d, tk) => tk.indices.map(p => (d, p)) }
      def m(d: Long, p: Int): Int = sufs.iterator
        .filter(o => o != ((d, p)))
        .map { case (od, op) => lcp(toks(d).drop(p), toks(od).drop(op)) }
        .max
      val expect = toks.flatMap { case (d, tk) =>
        val ivs = tk.indices.map(p => (p, m(d, p)))
          .filter(_._2 >= SuffixOps.MinDup).map { case (p, mm) => (p, p + mm) }
        if (ivs.isEmpty) None
        else {
          val sp = spansOf(ivs)
          Some(d -> (sp.size.toLong, sp.map(s => s._2 - s._1).sum.toLong))
        }
      }
      val got = SuffixOps.exactSpans(docs.toDF("doc_id", "text"))
        .select($"doc_id", $"n_spans", $"covered")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == expect, s"seed=$seed: ${got.toSet diff expect.toSet} / ${expect.toSet diff got.toSet}")
    }
  }

  test("repetition-heavy corpus: rank-equal mass closes token-free and exact") {
    // one 5000-token doc of ONE repeated token plus copies — nearly
    // every adjacent suffix pair is rank-equal (identical suffixes or
    // nested periodic prefixes), the r6 token-free fast path. The
    // engine must (a) finish without the bounded compare escalating
    // through the repetition (rank-equality closes it), and (b) get
    // the degenerate answer exactly: every position's max-LCP run
    // reaches the doc end, one span, full coverage.
    import spark.implicits._
    val n = 5000
    val mono = Array.fill(n)("z").mkString(" ")
    val docs = Seq((1L, mono), (2L, mono), (3L, "q1 q2 q3")).toDF("doc_id", "text")
    val got = SuffixOps.exactSpans(docs)
      .select($"doc_id", $"n_spans", $"covered", $"max_dup_len")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((1L, n.toLong, n.toLong)), s"${got(1L)}")
    assert(got(2L) == ((1L, n.toLong, n.toLong)))
    assert(!got.contains(3L), "unique doc reported as duplicated")
  }

  test("contamSpans == O(n²) cross-set brute force on tie-heavy random corpora") {
    import spark.implicits._
    for (seed <- Seq(11L, 919L, 52433L)) {
      val docs = corpus(seed, 24)
      val toks = docs.map { case (d, t) => d -> t.split(" ").toSeq }.toMap
      val benchSufs = toks.toSeq.filter(_._1 % 10 == 9)
        .flatMap { case (d, tk) => tk.indices.map(p => (d, p)) }
      def mCross(d: Long, p: Int): Int =
        if (benchSufs.isEmpty) 0
        else benchSufs.iterator
          .map { case (od, op) => lcp(toks(d).drop(p), toks(od).drop(op)) }
          .max
      val expect = toks.filter(_._1 % 10 != 9).flatMap { case (d, tk) =>
        val ivs = tk.indices.map(p => (p, mCross(d, p)))
          .filter(_._2 >= SuffixOps.ContamMinLen).map { case (p, mm) => (p, p + mm) }
        if (ivs.isEmpty) None
        else {
          val sp = spansOf(ivs)
          Some(d -> (sp.size.toLong, sp.map(s => s._2 - s._1).sum.toLong,
            ivs.map(i => i._2 - i._1).max.toLong))
        }
      }
      val got = SuffixOps.contamSpans(docs.toDF("doc_id", "text"))
        .select($"doc_id", $"n_spans", $"contaminated", $"max_contam_len")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == expect, s"seed=$seed: ${got.toSet diff expect.toSet} / ${expect.toSet diff got.toSet}")
    }
  }
}
