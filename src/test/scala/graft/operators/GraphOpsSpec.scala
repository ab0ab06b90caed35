package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Structural oracles for the graph/sequence operators — the DuckDB
  * gate pins exact values; these pin the mathematical invariants that
  * must hold on ANY input, so a refactor can't silently change the
  * semantics while still matching a regenerated oracle. */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("q_pagerank: ranks form a probability distribution with trade-weighted order") {
    val got = GraphOps.qPagerank(spark, sfDir).collect()
    assert(got.nonEmpty)
    // damped PageRank over a stochastic matrix conserves mass: sum = 1
    val mass = got.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass != 1")
    // every rank has at least the teleport floor
    val n = got.length
    got.foreach(r => assert(r.getDouble(1) >= 0.15 / n - 1e-9,
      s"${r.getString(0)} below teleport floor"))
    // output is rank-descending
    val prs = got.map(_.getDouble(1))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b }, "not sorted by pr desc")
  }

  test("q_pagerank: star topology concentrates rank on the hub") {
    // hand graph through the same iteration core: a 5-spoke star —
    // the hub must out-rank every spoke after any number of rounds
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
      .toDF("u", "v")
    val sym = edges.select($"u", $"v")
      .unionByName(edges.select($"v".as("u"), $"u".as("v")))
      .withColumn("w", lit(1.0))
    val out = sym.groupBy($"u").agg(sum($"w").as("wout"))
    val p = sym.join(out, "u").select($"u", $"v", ($"w" / $"wout").as("p"))
      .localCheckpoint(true)
    val n = 6.0
    var ranks = p.select($"u".as("node")).distinct().withColumn("r", lit(1.0 / n))
    for (_ <- 1 to 5) {
      ranks = p.join(ranks, p("u") === ranks("node"))
        .groupBy(p("v"))
        .agg((lit(0.15 / n) + lit(0.85) * sum(p("p") * ranks("r"))).as("r"))
        .select(col("v").as("node"), col("r"))
    }
    val byNode = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byNode(0L) > byNode(1L) * 3, s"hub ${byNode(0L)} not dominant over spoke ${byNode(1L)}")
    (1L to 5L).foreach(i => assert(math.abs(byNode(i) - byNode(1L)) < 1e-12,
      "symmetric spokes must tie exactly"))
  }

  test("triangleCorners: K4, path, and star hand graphs") {
    def corners(es: Seq[(Long, Long)]): Map[Long, Long] =
      GraphOps.triangleCorners(es.toDF("u", "v")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: every vertex sits on exactly C(3,2) = 3 triangles
    val k4 = corners(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert(k4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"K4 gave $k4")
    // a path and a star are triangle-free
    assert(corners(Seq((1L,2L),(2L,3L),(3L,4L))).isEmpty, "path has no triangles")
    assert(corners(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L))).isEmpty, "star has no triangles")
    // triangle with a pendant: pendant node absent, triangle nodes = 1
    val t = corners(Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L)))
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"pendant graph gave $t")
  }

  test("lpaLabels: two cliques with a bridge resolve to two communities") {
    // K4 on {1..4} and K4 on {11..14}, bridged by (4, 11): LPA with
    // min-label tie-break floods each clique from its smallest node
    def lpa(es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val e = es.toDF("u", "v")
      val sym = e.unionByName(e.select($"v".as("u"), $"u".as("v")))
      GraphOps.lpaLabels(sym, rounds).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cliques = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (11L,12L),(11L,13L),(11L,14L),(12L,13L),(12L,14L),(13L,14L),
      (4L,11L))
    val got = lpa(cliques, 3)
    val c1 = Set(1L,2L,3L,4L).map(got)
    val c2 = Set(11L,12L,13L,14L).map(got)
    assert(c1.size == 1, s"clique 1 split: $got")
    assert(c2.size == 1, s"clique 2 split: $got")
    assert(c1 != c2, s"bridge merged the cliques: $got")
    // a triangle floods to its min label
    val tri = lpa(Seq((5L,6L),(5L,7L),(6L,7L)), 3)
    assert(tri.values.toSet.size == 1, s"triangle not uniform: $tri")
  }

  test("q_frequent_triples: downward closure holds; matches brute force") {
    import spark.implicits._
    val triples = graft.operators.SupplyOps.qFrequentTriples(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(triples.nonEmpty)
    // brute-force replica over collected per-order itemsets
    val orders = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted).toSeq
    val expected = orders.flatMap { items =>
      for { i <- items.indices; j <- i + 1 until items.length; k <- j + 1 until items.length }
        yield (items(i), items(j), items(k))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    assert(triples == expected,
      s"missing=${(expected.keySet -- triples.keySet).take(3)} extra=${(triples.keySet -- expected.keySet).take(3)}")
    // downward closure: every sub-pair of a frequent triple is frequent
    val pairSup = orders.flatMap { items =>
      for { i <- items.indices; j <- i + 1 until items.length } yield (items(i), items(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    triples.keys.foreach { case (a, b, c) =>
      Seq((a, b), (a, c), (b, c)).foreach(p =>
        assert(pairSup(p) >= 2, s"closure violated for $p in ($a,$b,$c)"))
    }
  }

  test("q_markov_accuracy: rates bounded, test mass = odd-user transitions") {
    val rows = GraphOps.qMarkovAccuracy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "hits <= tests")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val oddTrans = graft.Tables.events(spark, sfDir)
      .withColumn("dst", lead($"event_type", 1).over(w))
      .where($"dst".isNotNull && $"user_id" % 2 === 1)
      .count()
    assert(rows.map(_.getLong(1)).sum == oddTrans, "test transitions conserved")
    // conditioning must beat the global mode somewhere (else the
    // model panel is vacuous on this stream)
    assert(rows.exists(r => r.getDouble(3) > r.getDouble(4)),
      "model never beats baseline — check the stream")
  }

  test("q_ppr: mass conserved, seed dominates, locality vs global PageRank") {
    val ppr = GraphOps.qPersonalizedPagerank(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pr = GraphOps.qPagerank(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ppr.keySet == pr.keySet && ppr.nonEmpty)
    // a damped walk conserves mass (symmetrized graph: no dangling)
    assert(math.abs(ppr.values.sum - 1.0) < 1e-3, s"mass ${ppr.values.sum}")
    // teleport pins the seed on top, strictly above its global rank
    val seed = ppr.maxBy(_._2)._1
    assert(ppr(seed) > pr(seed) + 0.05,
      s"seed $seed not personalized: ppr ${ppr(seed)} vs pr ${pr(seed)}")
    // personalization concentrates: top-1 share beats global top-1
    assert(ppr.values.max > pr.values.max)
  }

  test("q_graph_modularity: contributions match a driver replica; Q bounded") {
    val e = GraphOps.copurchaseEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = e ++ e.map(_.swap)
    // driver LPA replica: 3 synchronous rounds, (count desc, min lbl)
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to GraphOps.LpaRounds) {
      lbl = sym.groupBy(_._1).map { case (u, es) =>
        val counts = es.map(x => lbl(x._2)).groupBy(identity).view.mapValues(_.size)
        u -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = e.length.toDouble
    val expected = lbl.groupBy(_._2).map { case (c, ns) =>
      val nodes = ns.keySet
      val lc = e.count { case (u, v) => nodes(u) && nodes(v) }
      val dc = sym.count { case (u, _) => nodes(u) }
      val contrib = lc / m - (dc / (2 * m)) * (dc / (2 * m))
      c -> (nodes.size.toLong, lc.toLong, dc.toLong,
        math.floor(contrib * 1e6 + 0.5) / 1e6)
    }
    val got = GraphOps.qGraphModularity(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    expected.foreach { case (c, exp) => assert(got(c) == exp, s"community $c: ${got(c)} vs $exp") }
    val q = got.values.map(_._4).sum
    assert(q >= -0.5 && q <= 1.0, s"Q out of range: $q")
  }

  test("q_label_propagation: communities partition the node set") {
    val e = GraphOps.copurchaseEdges(spark, sfDir)
    val nNodes = e.select($"u".as("n")).unionByName(e.select($"v".as("n")))
      .distinct().count()
    val com = GraphOps.qLabelPropagation(spark, sfDir).collect()
    assert(com.nonEmpty)
    // communities of size >= 2 cover at most all nodes; sizes consistent
    val covered = com.map(_.getLong(1)).sum
    assert(covered <= nNodes && covered >= 2)
    com.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "min_node <= max_node")
      assert(r.getLong(1) >= 2)
    }
  }

  test("bfsDistances: chain + branch hand graph, hop cap, unreachable excluded") {
    // 0-1-2-3-4-5-6 chain with a branch 2-10, plus disconnected 99-100
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 10L), (99L, 100L))
    val sym = edges.toDF("u", "v")
      .unionByName(edges.map(_.swap).toDF("u", "v"))
    val got = GraphOps.bfsDistances(spark, sym, seed = 0L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 10L -> 3L, 4L -> 4L),
      s"distances wrong: $got")
    // 5, 6 are beyond the 4-hop bound; 99/100 are unreachable
    assert(!got.contains(5L) && !got.contains(99L))
    // distances are minimal, not path-order dependent: add a long
    // detour 0-20, 20-21, 21-2 — node 2 keeps dist 2
    val detour = edges ++ Seq((0L, 20L), (20L, 21L), (21L, 2L))
    val sym2 = detour.toDF("u", "v")
      .unionByName(detour.map(_.swap).toDF("u", "v"))
    val got2 = GraphOps.bfsDistances(spark, sym2, seed = 0L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(2L) == 2L && got2(21L) == 2L)
  }

  test("q_bfs_distance: seed at dist 0, levels contiguous, edge-consistent") {
    val got = GraphOps.qBfsDistance(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    if (got.nonEmpty) {
      assert(got.count(_._2 == 0L) == 1, "exactly one seed")
      val levels = got.map(_._2).distinct.sorted
      assert(levels.head == 0L && levels.max <= GraphOps.BfsMaxHops)
      // levels are contiguous: a node at dist d implies some node at d-1
      assert(levels.zip(levels.tail).forall { case (a, b) => b == a + 1 },
        s"gap in BFS levels: ${levels.toSeq}")
    }
  }

  test("q_markov_transitions: per-source probabilities sum to 1") {
    val got = GraphOps.qMarkovTransitions(spark, sfDir)
    val sums = got.groupBy($"src").agg(sum($"p").as("ps"), sum($"n").as("tn"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
        s"src ${r.getString(0)} probabilities sum to ${r.getDouble(1)}")
    }
    // transition counts conserve events: sum(n) = total events - one
    // terminal event per user (the last event has no successor)
    val ev = graft.Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    val gotN = got.agg(sum($"n")).head().getLong(0)
    assert(gotN == expected, s"transition mass $gotN != events-minus-terminals $expected")
  }

  test("q_mix_temperature: flattening inequality and integer targets") {
    val got = PipelineOps.qMixTemperature(spark, sfDir).collect()
    assert(got.nonEmpty)
    // α < 1 flattens: head sources lose share, tail sources gain
    got.foreach { r =>
      val (pRaw, pTemp) = (r.getDouble(2), r.getDouble(3))
      val mean = 1.0 / got.length
      if (pRaw > mean) assert(pTemp <= pRaw + 1e-9, s"head ${r.getString(0)} not flattened")
      else assert(pTemp >= pRaw - 1e-9, s"tail ${r.getString(0)} not lifted")
    }
    // both columns are distributions
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    // targets re-scale to ~ the corpus size (rounding slack ≤ #sources)
    val nTotal = got.map(_.getLong(1)).sum
    val tTotal = got.map(_.getLong(4)).sum
    assert(math.abs(tTotal - nTotal) <= got.length, s"targets $tTotal vs corpus $nTotal")
  }

  test("kcoreEdges: clique core survives, tails and bridges peel away") {
    import spark.implicits._
    // K5 on 1..5 (each degree 4) + a tail 5-10-11 (degrees 1-2) + a
    // pendant 3-12: the 3-core is exactly the K5 — the tail peels in
    // two rounds (11 first, then 10), the pendant in one, and the
    // peel must NOT cascade into the clique (degrees there stay 4)
    val k5 = for { u <- 1L to 5L; v <- (u + 1) to 5L } yield (u, v)
    val extra = Seq((5L, 10L), (10L, 11L), (3L, 12L))
    val edges = (k5 ++ extra).toDF("u", "v")
    val core = GraphOps.kcoreEdges(edges, 3)
      .as[(Long, Long)].collect().toSet
    assert(core == k5.toSet, s"3-core must be exactly the K5, got $core")
    // k above the clique degree empties the graph at the fixpoint
    assert(GraphOps.kcoreEdges(edges, 5).count() == 0L)
    // k=1 keeps everything (every endpoint of an edge has degree >= 1)
    assert(GraphOps.kcoreEdges(edges, 1).count() == edges.count())
  }
}
