package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{length, lit}

import graft.{SparkTestBase, Tables}

class CurationOpsSpec extends SparkTestBase {

  test("dedup_span_coverage: planted spans fold to the right interval union") {
    import spark.implicits._
    // doc 0 and 1 share a 10-token run (3 dup windows of W=8 each,
    // one span); doc 2 is clean filler long enough to window
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"$shared alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"iota kappa lambda mu nu xi omicron pi $shared"),
      (2L, (1 to 30).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val got = CurationOps.dedupSpanCoverage(spark, docsDir(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 10-token shared run = 3 sliding W=8 windows, union = 10 tokens
    assert(got.toSeq == Seq(
      (0L, 18L, 3L, 1L, 10L),
      (1L, 18L, 3L, 1L, 10L)), s"got: ${got.toSeq}")
  }

  test("dedup_span_coverage: real corpus rows are self-consistent and non-vacuous") {
    val rows = CurationOps.dedupSpanCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty, "no duplicated spans found on the synthetic corpus")
    val W = CurationOps.SpanW
    rows.foreach { r =>
      val (nTok, nWin, nSpans, covered) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nWin >= 1 && nSpans >= 1 && nSpans <= nWin)
      // each span covers >= W tokens; union never exceeds the doc
      assert(covered >= nSpans * W || nSpans == 1 && covered >= W,
        s"doc ${r.getLong(0)}: covered $covered vs $nSpans spans")
      assert(covered <= nTok)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("q_domain_cap: per-source heap selection matches a window replica") {
    import spark.implicits._
    val cap = CurationOps.DomainCap
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", graft.functions.Cols.normTokens($"text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).length.toLong))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val kept = ds.sortBy(d => (-d._3, d._1)).take(cap)
      (src, ds.length.toLong, ds.map(_._3).sum, kept.length.toLong, kept.map(_._3).sum)
    }.toSet
    val got = CurationOps.qDomainCap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
  }

  test("q_mmr_select: matches a driver-side greedy replica and actually diversifies") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val q = emb.find(_._1 == 0L).get._2
    val pool = emb.filter(_._1 > 0L).map { case (id, e) => (id, e, rnd6(cos(q, e))) }
    var sel = Vector.empty[(Long, Double, Double)]
    var selEmb = Vector.empty[Seq[Float]]
    while (sel.size < CurationOps.MmrK) {
      val cands = pool.filterNot(p => sel.exists(_._1 == p._1)).map { case (id, e, rel) =>
        val mx = if (selEmb.isEmpty) 0.0 else selEmb.map(se => rnd6(cos(se, e))).max
        (id, rel, rel / 2 - mx / 2, e)
      }
      val best = cands.minBy(c => (-c._3, c._1))
      sel :+= ((best._1, best._2, best._3)); selEmb :+= best._4
    }
    val got = CurationOps.qMmrSelect(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == sel, s"greedy trajectory diverged:\n$sel\nvs\n${got.toSeq}")
    // diversification must have bitten: past rank 1 every score embeds
    // a nonzero maxSim term (score != rel/2 — the penalty/bonus moved
    // the objective away from pure relevance), and picks are distinct
    assert(got.map(_._1).distinct.length == got.length)
    got.drop(1).foreach { case (id, rel, score) =>
      assert(score != rel / 2, s"pick $id: maxSim term had no effect")
    }
  }

  test("q_priority_sample: matches the deterministic Duffield replica, HT weights sane") {
    import spark.implicits._
    val k = CurationOps.PriK
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", graft.functions.Cols.normTokens($"text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).length.toLong))
    def unsigned(h: Long): BigInt = BigInt(h) & ((BigInt(1) << 64) - 1)
    val pri = docs.map { case (id, src, w) =>
      val hu = unsigned(graft.functions.Hashes.fnv64(id.toString))
      (src, id, w, w.toDouble * 1.8446744073709552e19 / (hu + 1).toDouble)
    }
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    val expected = pri.groupBy(_._1).flatMap { case (src, ds) =>
      val sorted = ds.sortBy(d => (-d._4, d._2))
      val tau = if (sorted.length > k) sorted(k)._4 else 0.0
      sorted.take(k).toSeq.map(d => (src, d._2, d._3, r2(d._4), r2(math.max(d._3.toDouble, tau))))
    }.toSet
    val got = CurationOps.qPrioritySample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == got.toSet.size && got.toSet == expected)
    // HT estimator weights never shrink a kept doc's true weight
    got.foreach { case (_, id, w, _, estW) =>
      assert(estW >= w - 1e-9, s"doc $id: est_w $estW < w $w")
    }
  }

  test("q_negative_pairs: positives are the exact top-5, negatives hash-picked outside top-50") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def unsigned(h: Long): BigInt = BigInt(h) & ((BigInt(1) << 64) - 1)
    val k = CurationOps.PairK
    val expected = emb.filter(_._1 < 10).flatMap { case (pid, pe) =>
      val ranked = emb.filter(_._1 != pid)
        .map { case (nid, ne) => (nid, rnd6(cos(pe, ne))) }
        .sortBy(d => (-d._2, d._1))
      val pos = ranked.take(k).zipWithIndex.map { case ((nid, sim), i) =>
        (pid, "pos", i + 1L, nid, sim)
      }
      val neg = ranked.drop(50)
        .map { case (nid, sim) => (nid, sim, unsigned(graft.functions.Hashes.fnv64(s"$pid:$nid"))) }
        .sortBy(d => (d._3, d._1)).take(k).zipWithIndex
        .map { case ((nid, sim, _), i) => (pid, "neg", i + 1L, nid, sim) }
      pos ++ neg
    }.toSet
    val got = CurationOps.qNegativePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == 10 * 2 * k, s"expected ${10 * 2 * k} rows, got ${got.length}")
    assert(got.toSet == expected)
    // hygiene: a nid never appears as both pos and neg for one probe
    got.groupBy(_._1).foreach { case (pid, rows) =>
      val pos = rows.filter(_._2 == "pos").map(_._4).toSet
      val neg = rows.filter(_._2 == "neg").map(_._4).toSet
      assert(pos.intersect(neg).isEmpty, s"probe $pid: pos/neg overlap")
    }
  }

  test("q_pareto_docs: kept set == brute-force skyline, nothing dominated survives") {
    import spark.implicits._
    val pts = Tables.documents(spark, sfDir)
      .select($"doc_id", graft.functions.Cols.normTokens($"text").as("tk"))
      .collect().map { r =>
        val tk = r.getSeq[String](1)
        (r.getLong(0), tk.length.toLong,
          math.floor(tk.distinct.length.toDouble / tk.length * 1e6 + 0.5) / 1e6)
      }.filter(_._2 >= 1)
    def dominated(a: (Long, Long, Double)) = pts.exists(b =>
      (b._2 > a._2 && b._3 >= a._3) || (b._2 == a._2 && b._3 > a._3))
    val expected = pts.filterNot(dominated).map(p => (p._1, p._2, p._3)).toSet
    val got = CurationOps.qParetoDocs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == expected,
      s"skyline mismatch: ${got.size} vs ${expected.size}")
  }

  test("mm_frame_sample: schedule arithmetic replica, caps and bounds hold") {
    import spark.implicits._
    val got = graft.operators.TextOps.mmFrameSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val expected = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._1 % 7 == 3)
      .flatMap { case (id, text) =>
        val dur = (text.getBytes("ISO-8859-1").length + 8).toLong * 40
        val nf = math.min(8L, ((dur - 1001) / 2000) + 1)
        (1L to nf).map(i => (id, dur, nf, i, 1000L + (i - 1) * 2000L))
      }.toSet
    assert(got.toSet == expected)
    got.foreach { case (_, dur, nf, idx, ts) =>
      assert(nf >= 1 && nf <= 8 && idx >= 1 && idx <= nf)
      assert(ts < dur, s"frame at $ts past end $dur")
    }
  }

  test("q_vocab_growth: token conservation and tail invariants per source") {
    import spark.implicits._
    val got = graft.operators.TextOps.qVocabGrowth(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val tokTotals = Tables.documents(spark, sfDir)
      .select($"source", graft.functions.Cols.normTokens($"text").as("tk"))
      .as[(String, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2.length.toLong).sum).toMap
    got.foreach { case (src, nTok, nTypes, nHapax) =>
      assert(nTok == tokTotals(src), s"$src: token mass not conserved")
      assert(nTypes >= 1 && nTypes <= nTok)
      assert(nHapax >= 0 && nHapax <= nTypes)
    }
  }

  test("q_dp_counts: noise scales ~1/eps, deterministic, never releases exactly") {
    import spark.implicits._
    val rows = CurationOps.qDpCounts(spark, sfDir)
      .as[(String, String, Double, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    // mean |noise| ordering across the three budgets: eps 0.5 > 1 > 5
    val byEps = rows.groupBy(_._3).view
      .mapValues(rs => rs.map(_._6).sum / rs.size).toMap
    assert(byEps.keySet == Set(0.5, 1.0, 5.0))
    assert(byEps(0.5) > byEps(1.0) && byEps(1.0) > byEps(5.0),
      s"E|noise| not ~1/eps: $byEps")
    // seeded mechanism is deterministic (the oracle-replay contract)
    val again = CurationOps.qDpCounts(spark, sfDir)
      .as[(String, String, Double, Long, Double, Double)].collect()
    assert(rows.toSeq == again.toSeq)
    // released values actually differ from the raw counts
    assert(rows.count { case (_, _, _, t, dp, _) => dp != t.toDouble } >= rows.length / 2)
  }

  /** Write a docs frame to a temp dir so dir-based query fns accept it. */
  private def docsDir(docs: DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("curation-docs").toString
    docs.withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(docs("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }
}
