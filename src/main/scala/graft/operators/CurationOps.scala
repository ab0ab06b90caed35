package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._
import graft.functions.VectorExpressions.{cosine_sim, fnv_shingles}

/** Corpus-curation operators beyond filtering/dedup: duplicated-span
  * accounting, per-domain quota selection, and diverse subset
  * selection — the passes that decide WHAT of the surviving corpus a
  * training run actually consumes.
  */
object CurationOps {
  import graft.SparkEntry.QueryFn

  /** Duplicated-span window width (tokens). Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better") use
    * 50-token substrings on real crawls; 8 matches the synthetic
    * corpus's planted span lengths while keeping the same shape. */
  val SpanW = 8

  /** Duplicated-substring span coverage — the doc-level accounting of
    * Lee et al.'s EXACTSUBSTR pass: every [[SpanW]]-token sliding
    * window is hashed (the same fused FNV shingle expression the
    * dedup suite uses), windows whose hash occurs ≥ 2× corpus-wide
    * (cross-doc or self-repeat, both memorization risks) are kept,
    * and per doc the overlapping hits are folded into disjoint spans
    * via the sorted-gap trick: sorted by start, a window contributes
    * `min(W, start − prev_start)` new covered tokens and opens a new
    * span iff the gap exceeds W. Output per affected doc: how many
    * windows duplicate, how many maximal spans they form, and the
    * fraction of the doc covered — the number a pipeline thresholds
    * to drop or trim documents.
    *
    * Scale shape: one corpus scan explodes windows map-side; one
    * shuffle on the 64-bit window hash (partial-agg'd count, then the
    * dup filter semi-joins hits on the same key — AQE re-plans the
    * post-filter side, which is tiny: dup windows ≪ windows); one
    * shuffle on doc_id for the per-doc sorted fold. Nothing is ever
    * pairwise — this is why EXACTSUBSTR works on trillion-token
    * corpora where suffix arrays need the whole corpus resident. */
  val dedupSpanCoverage: QueryFn = (s, dir) => {
    import s.implicits._
    val wins = Tables.documents(s, dir)
      .select($"doc_id", normTokens($"text").as("tk"))
      .select($"doc_id", size($"tk").cast("long").as("n_tokens"),
        fnv_shingles($"tk", SpanW).as("hs"))
      .where(size($"hs") > 0)
      .select($"doc_id", $"n_tokens", posexplode($"hs").as(Seq("st", "h")))
    val dups = wins.groupBy($"h").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"h")
    val w = Window.partitionBy($"doc_id").orderBy($"st")
    wins.join(dups, "h")
      .withColumn("gap", $"st" - lag($"st", 1).over(w))
      .groupBy($"doc_id")
      .agg(
        max($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_dup_windows"),
        (sum(when($"gap" > SpanW, 1L).otherwise(0L)) + 1L)
          .cast("long").as("n_spans"),
        // least() SKIPS nulls (Spark and DuckDB alike), so the first
        // window's null gap contributes least(null, W) = W — exactly
        // its full span — and every later window adds min(W, gap)
        sum(least($"gap", lit(SpanW))).cast("long").as("covered"))
      .select($"doc_id", $"n_tokens", $"n_dup_windows", $"n_spans", $"covered",
        rnd($"covered".cast("double") / $"n_tokens", 6).as("coverage"))
      .orderBy($"doc_id")
  }

  /** k-anonymity audit (Sweeney 2002) over the customer table — the
    * privacy-governance panel a training-data pipeline runs before a
    * structured table may ship: rows group by the quasi-identifier
    * set (nation, market segment, account-balance bracket) and the
    * panel reports how much of the table sits in equivalence classes
    * smaller than k for the standard k ∈ {2, 5, 10} — the rows a
    * k-anonymizer must generalize or suppress. All exact integer
    * counts to one final division; ONE partial+final agg over the
    * QI key then a ≤classes-sized fold — linear scan at any corpus
    * size, the q_customer_distribution two-level shape. */
  val qKAnonymity: QueryFn = (s, dir) => {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("long").as("bal_bracket"))
      .agg(count(lit(1)).as("n"))
    classes.agg(
        sum($"n").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min($"n").as("min_class"),
        sum(when($"n" < 2, $"n").otherwise(0L)).as("k2_violating_rows"),
        sum(when($"n" < 5, $"n").otherwise(0L)).as("k5_violating_rows"),
        sum(when($"n" < 10, $"n").otherwise(0L)).as("k10_violating_rows"))
      .select($"n_rows", $"n_classes", $"min_class",
        $"k2_violating_rows", $"k5_violating_rows", $"k10_violating_rows",
        rnd($"k5_violating_rows".cast("double") / $"n_rows".cast("double"), 6)
          .as("k5_violation_share"))
  }

  /** Differentially-private count release with SEEDED Laplace noise —
    * the governance family's RELEASE mechanism next to its audits
    * (k-anonymity and l-diversity say when a table is unsafe to
    * publish raw; this publishes the noisy version): per
    * (lang, source) document counts released at ε ∈ {0.5, 1, 5},
    * noise = Laplace(1/ε) via the inverse CDF
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|). `u` comes from a
    * mix64-finalized FNV of the group key + ε (the [[graft.functions
    * .Hashes.mix64]] discipline — bit-field uniformity matters here:
    * u IS a 53-bit field), shifted to the open interval
    * (k+0.5)/2⁵³ so ln(0) is unreachable. A production release draws
    * true randomness; the seeded twin has identical sensitivity
    * arithmetic and is replayable by the DuckDB oracle end-to-end,
    * which is what makes the mechanism TESTABLE (the spec checks the
    * E|noise| ∝ 1/ε ordering on the released panel itself).
    *
    * Scale shape: one partial+final group count, a 3-row broadcast
    * cross join, map-only noise. */
  val qDpCounts: QueryFn = (s, dir) => {
    import s.implicits._
    val grp = Tables.documents(s, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n_true"))
    val eps = Seq("0.5", "1.0", "5.0").toDF("eps_s")
    grp.crossJoin(broadcast(eps))
      .withColumn("h", graft.functions.VectorExpressions.mix64(
        element_at(fnv_shingles(
          array(concat_ws(":", lit("dp"), $"lang", $"source", $"eps_s")), 1), 1)))
      .withColumn("eps", $"eps_s".cast("double"))
      .withColumn("u",
        (shiftrightunsigned($"h", 11).cast("double") + lit(0.5)) /
          lit(9007199254740992.0))
      .withColumn("noise",
        (-(lit(1.0) / $"eps")) * signum($"u" - 0.5) *
          log(lit(1.0) - lit(2.0) * abs($"u" - 0.5)))
      .select($"lang", $"source", $"eps", $"n_true",
        rnd($"n_true" + $"noise", 4).as("n_dp"),
        rnd(abs($"noise"), 4).as("abs_noise"))
      .orderBy($"lang", $"source", $"eps")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    * necessary companion: a class can be large (k-anonymous) yet
    * reveal everyone's sensitive value if it is UNIFORM. Here the QI
    * is (nation, balance bracket) and the sensitive attribute is the
    * market segment; per class the panel counts DISTINCT sensitive
    * values and reports rows in classes with < l of them for
    * l ∈ {2, 3} — the homogeneity-attack surface. Exact distinct
    * counts per class (the classes are the unit of decision — an
    * approximate distinct would answer a different question); two
    * partial+final aggs, linear. */
  val qLDiversity: QueryFn = (s, dir) => {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .groupBy($"c_nationkey",
        floor($"c_acctbal" / 1000).cast("long").as("bal_bracket"))
      .agg(count(lit(1)).as("n"),
        count_distinct($"c_mktsegment").as("d"))
    classes.agg(
        sum($"n").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min($"d").as("min_diversity"),
        sum(when($"d" < 2, $"n").otherwise(0L)).as("l2_violating_rows"),
        sum(when($"d" < 3, $"n").otherwise(0L)).as("l3_violating_rows"))
      .select($"n_rows", $"n_classes", $"min_diversity",
        $"l2_violating_rows", $"l3_violating_rows",
        rnd($"l2_violating_rows".cast("double") / $"n_rows".cast("double"), 6)
          .as("l2_violation_share"))
  }

  /** Per-domain document quota. */
  val DomainCap = 15

  /** Per-domain quota selection — the Common-Crawl-style cap that
    * stops one prolific domain from dominating the corpus: within
    * each source, keep the [[DomainCap]] highest-token documents
    * (doc_id tiebreak) and account for what the cap keeps vs drops.
    *
    * Deliberately NOT a window `row_number` over every row: the kept
    * set comes from the native TopKPerKey operator (bounded per-key
    * heaps, ≤ cap rows per (partition, source) ever shuffle), so a
    * domain with 10⁹ documents costs its scan, not its sort. The
    * totals side is a plain partial+final agg; the two 20-row
    * summaries broadcast-join back together. */
  val qDomainCap: QueryFn = (s, dir) => {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"source",
        size(normTokens($"text")).cast("long").as("n_tokens"))
    val totals = scored.groupBy($"source").agg(
      count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens_total"))
    val kept = graft.plans.TopK.perKey(
        scored, Seq("source"), Seq("n_tokens" -> false, "doc_id" -> true),
        DomainCap)
      .groupBy($"source").agg(
        count(lit(1)).as("n_kept"), sum($"n_tokens").as("tokens_kept"))
    totals.join(broadcast(kept), "source")
      .select($"source", $"n_docs", $"tokens_total", $"n_kept", $"tokens_kept",
        rnd($"tokens_kept".cast("double") / $"tokens_total".cast("double"), 6)
          .as("kept_share"))
      .orderBy($"source")
  }

  /** Diverse-selection size. */
  val MmrK = 5

  /** Greedy MMR (maximal marginal relevance, Carbonell & Goldstein
    * 1998) diverse top-k: pick [[MmrK]] corpus vectors maximizing
    * `rel/2 − maxSimToSelected/2` (λ = 1/2 — exact in binary, the
    * same fixed-constant discipline as q_mix_temperature's α) against
    * the vec_id-0 query vector. The curation use: seed few-shot /
    * eval pools with relevant-but-not-redundant examples instead of
    * k near-identical nearest neighbours.
    *
    * Greedy MMR is inherently sequential in k — but each round is ONE
    * map-side corpus pass (relevance and the ≤ k−1 selected-vector
    * cosines all against broadcast literals, rounded at 6 dp exactly
    * like the ANN ranking keys) feeding a TakeOrderedAndProject of a
    * single row; the driver ever holds k×d floats. At 100 TB: k scans
    * with zero shuffles — compose with an ANN shortlist first to cut
    * the scan to candidates when k is large. Determinism: rounded
    * scores, vec_id tiebreak, so DuckDB replays all k rounds. */
  val qMmrSelect: QueryFn = (s, dir) => {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val qvec = emb.where($"vec_id" === 0).select($"embedding").head.getSeq[Float](0)
    val base = emb.where($"vec_id" > 0)
      .select($"vec_id", $"embedding",
        rnd(cosine_sim(typedlit(qvec), $"embedding"), 6).as("rel"))
    var picks = Vector.empty[(Long, Double, Double, Seq[Float])]
    while (picks.size < MmrK) {
      val maxSim: Column = picks.map(p =>
          rnd(cosine_sim(typedlit(p._4), $"embedding"), 6)) match {
        case Seq()  => lit(0.0)
        case Seq(c) => c
        case cs     => greatest(cs: _*)
      }
      val cand =
        if (picks.isEmpty) base
        else base.where(!$"vec_id".isin(picks.map(_._1): _*))
      val row = cand
        .select($"vec_id", $"embedding", $"rel",
          ($"rel" / 2 - maxSim / 2).as("score"))
        .orderBy($"score".desc, $"vec_id").limit(1).head
      picks :+= ((row.getLong(0), row.getDouble(2), row.getDouble(3),
        row.getSeq[Float](1)))
    }
    picks.zipWithIndex.map { case ((id, rel, sc, _), i) =>
      (i + 1L, id, rel, sc)
    }.toDF("rank", "vec_id", "rel", "score").orderBy($"rank")
  }

  /** Weighted sample size per source. */
  val PriK = 10

  /** Deterministic weighted priority sampling per source (Duffield,
    * Lund & Thorup 2007): priority qᵢ = wᵢ/uᵢ with wᵢ = token count
    * and uᵢ = (hᵢ+1)/2⁶⁴ derived from the doc-id FNV hash — so the
    * "uniform" is replayable and the whole sample is a pure function
    * of the corpus. Keep the top [[PriK]] priorities per source;
    * τ = (k+1)-th priority gives the Horvitz-Thompson estimator
    * weight max(wᵢ, τ), which makes Σ est_w an unbiased estimate of
    * the group's total token mass — the sampling pass a pipeline
    * uses to build weight-faithful dev subsets (vs
    * `q_stratified_sample`'s unweighted Bernoulli).
    *
    * Determinism discipline: qᵢ = (w·2⁶⁴)/(h+1) is ONE IEEE division
    * of two exactly-converted integers (w·2⁶⁴ is an exponent shift,
    * exact; h+1 ≤ 2⁶⁴ rounds identically in any engine), so the
    * ranking needs no pre-rounding — ties broken on doc_id anyway.
    * Scale shape: the heavy selection is native TopKPerKey bounded
    * heaps at k+1 (never a per-source sort); the rank/τ window runs
    * over the ≤(k+1)-per-source survivors only. */
  val qPrioritySample: QueryFn = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"source",
        size(normTokens($"text")).cast("long").as("w"),
        element_at(graft.functions.VectorExpressions.fnv_shingles(
          array($"doc_id".cast("string")), 1), 1).as("h"))
      .select($"doc_id", $"source", $"w",
        when($"h" < 0, $"h".cast(DecimalType(20, 0)) + two64)
          .otherwise($"h".cast(DecimalType(20, 0))).as("hu"))
      .select($"doc_id", $"source", $"w",
        ($"w".cast("double") * lit(1.8446744073709552e19) /
          ($"hu" + 1).cast("double")).as("q"))
    val top = graft.plans.TopK.perKey(
      scored, Seq("source"), Seq("q" -> false, "doc_id" -> true), PriK + 1)
    val w = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id")
    val ranked = top.withColumn("rk", row_number().over(w))
    val tau = ranked.where($"rk" === PriK + 1)
      .select($"source", $"q".as("tau"))
    ranked.where($"rk" <= PriK)
      .join(broadcast(tau), Seq("source"), "left")
      .select($"source", $"doc_id", $"w",
        rnd($"q", 2).as("priority"),
        rnd(greatest($"w".cast("double"), coalesce($"tau", lit(0.0))), 2)
          .as("est_w"))
      .orderBy($"source", $"doc_id")
  }

  /** Positives / negatives per probe. */
  val PairK = 5

  /** Contrastive training-pair mining over the embeddings table: for
    * each probe (vec_id < 10), emit its [[PairK]] nearest neighbours
    * as positives and [[PairK]] hash-picked HARD-EXCLUDED negatives —
    * drawn deterministically from outside the probe's top-50
    * shortlist, so a near-positive can never be mislabelled negative
    * (the standard in-batch-negatives hygiene for embedding /
    * reranker training sets).
    *
    * Scale shape: positives ride the same broadcast-probe scan +
    * native TopKPerKey as `ann_bruteforce_topk` (at real scale, swap
    * the scan for the IVF/PQ shortlist — same tail); negatives are
    * the top-[[PairK]] BY HASH of a per-(probe,candidate) FNV — again
    * bounded heaps, no sort, no RNG. Everything is a pure function of
    * the corpus, so the oracle replays both sides. */
  val qNegativePairs: QueryFn = (s, dir) => {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val pr = emb.where($"vec_id" < 10)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
    val cands = emb.join(broadcast(pr), $"vec_id" =!= $"pid")
      .select($"pid", $"vec_id".as("nid"),
        rnd(cosine_sim($"pe", $"embedding"), 6).as("sim"))
    val short = graft.plans.TopK.perKey(
      cands, Seq("pid"), Seq("sim" -> false, "nid" -> true), 50)
    val w = Window.partitionBy($"pid").orderBy($"sim".desc, $"nid")
    val pos = graft.plans.TopK.perKey(
        short, Seq("pid"), Seq("sim" -> false, "nid" -> true), PairK)
      .withColumn("rk", row_number().over(w))
      .select($"pid", lit("pos").as("kind"), $"rk".cast("long").as("rk"),
        $"nid", $"sim")
    // the pick hash rides the same unsigned DECIMAL(20,0) bridge as
    // q_kmv_distinct so Spark's signed longs and the oracle's
    // HUGEINT order identically
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    val neg = cands
      .join(short.select($"pid", $"nid"), Seq("pid", "nid"), "left_anti")
      .select($"pid", $"nid", $"sim",
        element_at(graft.functions.VectorExpressions.fnv_shingles(
          array(concat_ws(":", $"pid", $"nid")), 1), 1).as("h"))
      .select($"pid", $"nid", $"sim",
        when($"h" < 0, $"h".cast(org.apache.spark.sql.types.DecimalType(20, 0)) + two64)
          .otherwise($"h".cast(org.apache.spark.sql.types.DecimalType(20, 0))).as("hu"))
    val nw = Window.partitionBy($"pid").orderBy($"hu".asc, $"nid")
    val negK = graft.plans.TopK.perKey(
        neg, Seq("pid"), Seq("hu" -> true, "nid" -> true), PairK)
      .withColumn("rk", row_number().over(nw))
      .select($"pid", lit("neg").as("kind"), $"rk".cast("long").as("rk"),
        $"nid", $"sim")
    pos.unionByName(negK).orderBy($"pid", $"kind", $"rk")
  }

  /** Pareto frontier (2D skyline) of the corpus in the
    * (length, lexical-diversity) plane: a doc survives iff no other
    * doc strictly dominates it — longer AND at-least-as-diverse, or
    * same length AND strictly more diverse. The multi-criteria
    * selection pass for "which docs are worth the tokens": anything
    * off the frontier is beaten on both axes at once. Diversity =
    * type-token ratio rounded at 6 dp BEFORE the dominance test, so
    * the frontier itself is engine-portable.
    *
    * Scale shape: the naive skyline is an O(n²) NOT-EXISTS (the
    * oracle runs exactly that — DuckDB affords it at test scale);
    * the Spark plan exploits the 2D structure instead: collapse to
    * one (x, maxy) row per distinct length (partial-agg'd — bounded
    * by the length domain, not the corpus), a running strictly-prior
    * max over that tiny frame, and a broadcast join back. Corpus
    * cost: one scan + one length-keyed agg; the window never sees
    * corpus-sized input. */
  val qParetoDocs: QueryFn = (s, dir) => {
    import s.implicits._
    val pts = Tables.documents(s, dir)
      .select($"doc_id", normTokens($"text").as("tk"))
      .select($"doc_id", size($"tk").cast("long").as("n_tokens"),
        size(array_distinct($"tk")).cast("long").as("n_types"))
      .select($"doc_id", $"n_tokens",
        rnd($"n_types".cast("double") / $"n_tokens", 6).as("ttr"))
      .where($"n_tokens" >= 1)
    val perX = pts.groupBy($"n_tokens".as("fx")).agg(max($"ttr").as("maxy"))
    val frontier = Ranked
      .withStrictPriorMax(perX, Seq($"fx".desc), $"maxy", "prev_max")
      .where($"prev_max".isNull || $"prev_max" < $"maxy")
      .select($"fx", $"maxy")
    pts.join(broadcast(frontier),
        $"n_tokens" === $"fx" && $"ttr" === $"maxy")
      .select($"doc_id", $"n_tokens", $"ttr")
      .orderBy($"n_tokens".desc, $"doc_id")
  }
}
