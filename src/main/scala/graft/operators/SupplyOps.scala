package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols.{rnd, xsum}

/** Supply-chain analytics flavors (SURVEY §2.B cont.): Q11/Q20-style
  * concentration queries and market-basket co-occurrence. All three
  * follow the same scale posture as the rest of the relational
  * surface — fact-side partial+final aggregation, 1-row totals joined
  * back as broadcasts, never a driver-side collect.
  */
object SupplyOps {
  import graft.SparkEntry.QueryFn

  /** Q11-flavored part value concentration: parts whose lineitem
    * revenue exceeds 1.5× the mean part revenue (the TPC-H Q11 shape —
    * per-key value vs a fraction-of-total threshold — with lineitem
    * standing in for partsupp). The threshold is relative, so the
    * query is scale-invariant; the grand total is a 1-row broadcast,
    * never a driver value. One shuffle on l_partkey. */
  val q11PartValueShare: QueryFn = (s, dir) => {
    import s.implicits._
    val pv = Tables.lineitem(s, dir)
      .select($"l_partkey", ($"l_extendedprice" * (lit(1) - $"l_discount")).as("val"))
      .groupBy($"l_partkey")
      .agg(xsum($"val").as("value"))
    val tot = pv.agg(xsum($"value").as("tot"), count(lit(1)).as("np"))
    pv.crossJoin(broadcast(tot))
      .where($"value" > lit(1.5) * $"tot" / $"np")
      .select($"l_partkey",
        rnd($"value", 2).as("value"),
        rnd($"value" / $"tot", 6).as("share"))
      .orderBy($"l_partkey")
  }

  /** Q20-flavored dominant suppliers: suppliers that shipped more than
    * half of a multi-supplier part's 1996 volume, for at least 5 such
    * parts. Two partial+final aggs on (suppkey, partkey) then partkey;
    * the date filter is pushed to the parquet scan. The supplier dim
    * joins in as a broadcast. */
  val q20ExcessSuppliers: QueryFn = (s, dir) => {
    import s.implicits._
    val sq = Tables.lineitem(s, dir)
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"l_quantity").as("qty"))
    val pt = sq.groupBy($"l_partkey")
      .agg(sum($"qty").as("pqty"), count(lit(1)).as("nsupp"))
    val dom = sq.join(pt, "l_partkey")
      .where($"nsupp" >= 2 && $"qty" > lit(0.5) * $"pqty")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_dominant"))
      .where($"n_dominant" >= 5)
    dom.join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_dominant")
      .orderBy($"s_suppkey")
  }

  /** Market-basket co-occurrence: part pairs ordered together in ≥ 3
    * orders. The classic within-group self-join — distinct
    * (order, part) first, then pairs meet on l_orderkey. Orders hold
    * only a handful of distinct parts, so the per-order pair expansion
    * is bounded-quadratic in a small constant (at 100 TB the shuffle
    * is the distinct + the pair groupBy, both partial-aggregated; an
    * order with millions of items would need a per-order cap, which
    * real basket data never hits). */
  /** Association rules from the co-purchase supports — the
    * market-basket step AFTER pair mining: every supported pair
    * emits both directed rules a→b and b→a with confidence
    * support(ab)/support(a) and lift confidence/P(b); top 20 rules
    * by (lift, confidence). All ratios are single divisions of exact
    * integer counts (no logs — the q_collocations discipline), so
    * the ranking replays bit-for-bit. Shape: the per-order itemset
    * pair scan (one groupBy shuffle), item supports as one agg
    * broadcast back, TopKPerKey heaps for the ranking. */
  val qBasketRules: QueryFn = (s, dir) => {
    import s.implicits._
    val op = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val nOrders = op.select($"l_orderkey").distinct().count()
    val itemSup = op.groupBy($"l_partkey".as("item")).agg(count(lit(1)).as("sup"))
    // r13: pair supports from the shared map-side itemset fan-out
    // (GraphOps.orderPairs — one fact shuffle instead of the
    // fact-fact self-join, guide §2.3); checkpointed because the
    // rule stream consumes it twice (ante/cons mirror)
    val pairSup = Checkpoints.cut(GraphOps.orderPairs(s, dir)
      .select($"u".as("pa"), $"v".as("pb"), $"support".as("sup_ab"))
      .where($"sup_ab" >= 3))
    val rules = pairSup
      .select($"pa".as("ante"), $"pb".as("cons"), $"sup_ab")
      .unionByName(pairSup.select($"pb".as("ante"), $"pa".as("cons"), $"sup_ab"))
      .join(broadcast(itemSup.select($"item".as("ante"), $"sup".as("sup_a"))), "ante")
      .join(broadcast(itemSup.select($"item".as("cons"), $"sup".as("sup_c"))), "cons")
      .select($"ante", $"cons", $"sup_ab", $"sup_a", $"sup_c",
        rnd($"sup_ab".cast("double") / $"sup_a", 6).as("confidence"),
        rnd(($"sup_ab".cast("double") * nOrders) /
          ($"sup_a".cast("double") * $"sup_c".cast("double")), 4).as("lift"))
    graft.plans.TopK.perKey(
        rules.withColumn("g", lit(1)),
        Seq("g"), Seq("lift" -> false, "confidence" -> false,
          "ante" -> true, "cons" -> true), 20)
      .select($"ante", $"cons", $"sup_ab", $"confidence", $"lift")
      .orderBy($"lift".desc, $"confidence".desc, $"ante", $"cons")
  }

  /** Frequent 3-itemsets with A-priori pruning (Agrawal & Srikant
    * 1994) — market-basket depth beyond [[qCopurchasePairs]]'s
    * pairs: candidate triples are generated ONLY from frequent
    * pairs sharing a prefix (the downward-closure property: a
    * frequent {a,b,c} requires frequent {a,b}, {a,c}, {b,c}), then
    * counted in one pass over per-order itemsets. The prune is the
    * scale story: the raw triple space is Σ width³/6 per order;
    * candidates from frequent-pair joins are support-bounded, which
    * is why A-priori (and its SON/partitioned descendants) run at
    * warehouse scale. Every count exact; support ≥ 2 on orders. */
  val qFrequentTriples: QueryFn = (s, dir) => {
    import s.implicits._
    // r13: ONE checkpointed per-order itemset substrate replaces the
    // four distinct-projection subtrees the old plan re-derived from
    // the fact table (two self-joins on l_orderkey plus two more
    // scans — guide §2.3/§3.3): per-order pairs fan out map-side
    // from the sorted itemsets, and the third item joins back to the
    // exploded itemset stream.
    val byOrder = Checkpoints.cut(GraphOps.orderItemsets(s, dir))
    val perOrderPairs = byOrder
      .select($"l_orderkey", explode(GraphOps.pairsOfItemset($"ps")).as("pr"))
      .select($"l_orderkey", $"pr.u".as("a"), $"pr.v".as("b"))
    val pairs = perOrderPairs
      .groupBy($"a", $"b").agg(count(lit(1)).as("sup"))
      .where($"sup" >= 2)
      .select($"a", $"b").localCheckpoint(true)
    // candidate {a,b,c}: frequent {a,b} + frequent {a,c} (b < c),
    // kept only if {b,c} is frequent too (full downward closure)
    val cands = pairs.as("p1")
      .join(pairs.as("p2"), $"p1.a" === $"p2.a" && $"p1.b" < $"p2.b")
      .select($"p1.a".as("a"), $"p1.b".as("b"), $"p2.b".as("c"))
      .join(pairs.select($"a".as("b"), $"b".as("c")), Seq("b", "c"), "left_semi")
    // enumeration is pruned AS IT GROWS, not after: the (a,b) pair
    // stream semi-joins against frequent pairs BEFORE the third item
    // joins in — Spark cannot push a three-column semi-join below
    // the join that produces c, so without this staging the physical
    // fan-out is the full width³ triple space and the A-priori prune
    // never bounds anything
    val freqPairsPerOrder = perOrderPairs
      .join(pairs, Seq("a", "b"), "left_semi")
    val triples = freqPairsPerOrder
      .join(byOrder.select($"l_orderkey", explode($"ps").as("c")),
        Seq("l_orderkey"))
      .where($"b" < $"c")
      .join(cands, Seq("a", "b", "c"), "left_semi")
      .groupBy($"a", $"b", $"c").agg(count(lit(1)).as("support"))
      .where($"support" >= 2)
    triples.orderBy($"support".desc, $"a", $"b", $"c")
  }

  val qCopurchasePairs: QueryFn = (s, dir) => {
    import s.implicits._
    // r13: the shared map-side itemset fan-out (GraphOps.orderPairs)
    // replaces the fact-fact self-join — identical per-order
    // distinct pairs and counts, one fact shuffle (guide §2.3)
    GraphOps.orderPairs(s, dir)
      .select($"u".as("part_a"), $"v".as("part_b"),
        $"support".as("n_orders"))
      .where($"n_orders" >= 3)
      .orderBy($"part_a", $"part_b")
  }
}
