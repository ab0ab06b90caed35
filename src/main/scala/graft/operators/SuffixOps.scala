package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** EXACT duplicated-substring accounting via a distributed suffix
  * array — the true form of Lee et al. 2021's EXACTSUBSTR pass that
  * [[CurationOps.dedupSpanCoverage]] approximates with fixed-width
  * hashed windows.
  *
  * The windowed pass has two approximations the exact pass removes:
  *   1. windows are FNV-hashed — a 64-bit collision would mark a
  *      never-repeated window as duplicated (no collision exists in
  *      the sf corpora, but the guarantee is probabilistic);
  *   2. span extents are window-width quantized, so a merged run of
  *      windows can NOT distinguish one 16-token verbatim duplicate
  *      from two unrelated 8-token matches that happen to abut — the
  *      chimera span reads as one long "duplicated substring" that
  *      never actually repeats anywhere (see SuffixSpec).
  *
  * Algorithm (all-Spark, O(log maxDocLen) rounds, never pairwise):
  *   - token ranks: one global rank over the distinct vocabulary
  *     ([[Ranked]] — any dense total order works; LCPs only use rank
  *     EQUALITY, so Spark's and the oracle's orders may differ);
  *   - prefix doubling (Manber–Myers): rank of the 2w-token prefix =
  *     dense rank of (rank_w(p), rank_w(p+w)) pairs; `lead(w)` over
  *     the doc-partitioned position order supplies the shifted rank,
  *     a distinct + global rank + equi-join back produces the new
  *     table — 3 bounded shuffles per round, log₂(maxDocLen) rounds
  *     (suffixes never cross documents, so maxDocLen bounds depth);
  *   - neighbor LCPs by binary lifting down the saved rank tables:
  *     adjacent suffixes in suffix order (rank + rn±1 self-join, the
  *     [[Ranked]] lag idiom) extend their common prefix by w
  *     whenever the width-w ranks at the shifted positions agree and
  *     stay in bounds — an equi-join per level, log rounds again;
  *   - the max-LCP-with-any-other-suffix of position p is attained
  *     at an adjacent suffix in ANY lexicographic order, so
  *     m(p) = max(lcp(prev), lcp(next)) is exact; every interval
  *     [p, p+m(p)) with m(p) ≥ [[CurationOps.SpanW]] is a genuinely
  *     repeated substring, and their per-doc union (gaps-and-islands
  *     over a doc-partitioned window) gives maximal covered spans
  *     plus the TRUE max duplicated-substring length per doc.
  *
  * At 100 TB: every stage is a bounded equi-shuffle or a
  * doc/pid-partitioned window; rounds grow with log(maxDocLen) (a
  * 100k-token doc = 17 doubling rounds), and the rank tables are
  * position-keyed frames that persist serialized ([[Pin]]) — this is
  * the Flick–Aluru distributed-suffix-array shape, not a
  * single-node suffix automaton. The oracle replays the semantics
  * independently in DuckDB by sorting materialized suffix lists.
  */
object SuffixOps {
  import graft.SparkEntry.QueryFn

  /** Minimum duplicated-substring length (tokens) — matches
    * [[CurationOps.SpanW]] so coverage cross-validates against the
    * windowed pass on a collision-free corpus. */
  val MinDup: Int = CurationOps.SpanW

  /** Per-position max-LCP frame: (doc_id, pos, len, m) where m is
    * the exact length of the longest substring starting at pos that
    * occurs ≥ 2 times corpus-wide (self-repeats included). */
  def maxLcp(toks: DataFrame): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._

    // The build is ~20 synchronous rounds of BOUNDED shuffles over
    // the position frame — job-count-dominated, not data-dominated,
    // at bench scale. Run the rounds at a narrower shuffle width
    // (the frame is positions-sized; at 100 TB a cluster raises this
    // conf, the ROUND COUNT stays log(maxDocLen)).
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions", "32")
    s.conf.set("spark.sql.shuffle.partitions",
      math.max(8, prevShuffle.toInt / 4).toString)
    try maxLcpRounds(toks)
    finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private def maxLcpRounds(toks: DataFrame): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._

    // token → dense rank (vocabulary-keyed shuffle join back)
    val tokRank = Ranked.withGlobalRank(
      toks.select($"tok").distinct(), Seq($"tok".asc), "tr").df
    var r = toks.join(tokRank, "tok")
      .select($"doc_id", $"pos", $"len", $"tr".as("r"))
      .localCheckpoint(true)

    val maxLen = toks.agg(max($"len")).collect()(0).getLong(0)
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")

    // rank tables widest-first for the LCP descent; width 1 last
    var tables = List((1L, r))
    var width = 1L
    while (width < maxLen) {
      val paired = r.withColumn("r2",
        coalesce(lead($"r", width.toInt).over(byDoc), lit(-1L)))
      val pairRank = Ranked.withGlobalRank(
        paired.select($"r", $"r2").distinct(),
        Seq($"r".asc, $"r2".asc), "nr").df
      r = paired.join(pairRank, Seq("r", "r2"))
        .select($"doc_id", $"pos", $"len", $"nr".as("r"))
        .localCheckpoint(true)
      width *= 2
      tables = (width, r) :: tables
    }

    // adjacent suffixes in suffix order (ties = identical suffixes;
    // any order within a tie is fine — their LCP is full length)
    val ord = Ranked.withGlobalRank(
      r, Seq($"r".asc, $"doc_id".asc, $"pos".asc), "sn").df
      .localCheckpoint(true)
    val nxt = ord.select(($"sn" - 1).as("pn"), $"doc_id".as("db"),
      $"pos".as("pb"), $"len".as("lb"))
    var pairs = ord.join(nxt, $"sn" === $"pn")
      .select($"doc_id".as("da"), $"pos".as("pa"), $"len".as("la"),
        $"db", $"pb", $"lb")
      .withColumn("lcp", lit(0L))

    // binary-lifting descent: extend by w when width-w ranks agree
    // at the current frontier AND both substrings are fully in
    // bounds (clipped ranks at doc tails must not extend past len).
    // The widest table can exceed maxDocLen (the last doubling
    // overshoots) — its bounds guard can never pass, so skip it; and
    // checkpoint every OTHER round (the lineage of two join rounds
    // is cheap; a materialization job per round is not).
    val descent = tables.filter(_._1 <= maxLen)
    descent.zipWithIndex.foreach { case ((w, tab), i) =>
      val ta = tab.select($"doc_id".as("xda"), $"pos".as("xpa"), $"r".as("ra"))
      val tb = tab.select($"doc_id".as("xdb"), $"pos".as("xpb"), $"r".as("rb"))
      pairs = pairs
        .join(ta, $"da" === $"xda" && $"pa" + $"lcp" === $"xpa", "left")
        .join(tb, $"db" === $"xdb" && $"pb" + $"lcp" === $"xpb", "left")
        .withColumn("lcp",
          when($"ra".isNotNull && $"rb".isNotNull && $"ra" === $"rb" &&
            $"pa" + $"lcp" + w <= $"la" && $"pb" + $"lcp" + w <= $"lb",
            $"lcp" + w).otherwise($"lcp"))
        .drop("xda", "xpa", "ra", "xdb", "xpb", "rb")
      if (i % 2 == 1 || i == descent.size - 1)
        pairs = pairs.localCheckpoint(true)
    }

    // m(p) = max over both directed neighbors
    pairs.select($"da".as("doc_id"), $"pa".as("pos"), $"la".as("len"), $"lcp")
      .unionByName(
        pairs.select($"db".as("doc_id"), $"pb".as("pos"), $"lb".as("len"), $"lcp"))
      .groupBy($"doc_id", $"pos", $"len")
      .agg(max($"lcp").as("m"))
  }

  /** Per-doc exact duplicated-span accounting: doc_id, n_tokens,
    * n_spans, covered, max_dup_len, coverage. Coverage equals the
    * windowed pass on a collision-free corpus (SuffixSpec asserts
    * this on the sf corpus); max_dup_len is the signal the windowed
    * pass cannot produce. */
  val qDedupExactSubstr: QueryFn = (s, dir) =>
    exactSpans(Tables.documents(s, dir))

  /** Full pipeline from any (doc_id, text) frame — split out so the
    * spec can run it on a crafted chimera corpus. */
  def exactSpans(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select($"doc_id", normTokens($"text").as("tk"))
      .select($"doc_id", size($"tk").cast("long").as("len"),
        posexplode($"tk").as(Seq("p", "tok")))
      .select($"doc_id", $"p".cast("long").as("pos"), $"len", $"tok")

    val ints = maxLcp(toks).where($"m" >= MinDup)

    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val prevEnd = max($"pos" + $"m")
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = ints
      .withColumn("brk",
        when(prevEnd.isNull || $"pos" > prevEnd, 1L).otherwise(0L))
      .withColumn("grp", sum($"brk")
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"grp")
      .agg(min($"pos").as("st"), max($"pos" + $"m").as("en"), max($"m").as("mx"),
        max($"len").as("len"))
    spans.groupBy($"doc_id")
      .agg(max($"len").as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum($"en" - $"st").as("covered"),
        max($"mx").as("max_dup_len"))
      .select($"doc_id", $"n_tokens", $"n_spans", $"covered", $"max_dup_len",
        rnd($"covered".cast("double") / $"n_tokens", 6).as("coverage"))
      .orderBy($"doc_id")
  }
}
