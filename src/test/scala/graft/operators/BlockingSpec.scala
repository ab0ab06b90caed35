package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The degenerate-band guarantee ([[Blocking]]): a block far over the
  * anchor budget emits LINEAR candidates, stays fully connected
  * through its anchors, and blocks at or under the budget are
  * bit-identical to the uncapped self-join. */
class BlockingSpec extends SparkTestBase {
  import spark.implicits._

  /** The uncapped generator the production one replaced — kept here
    * as the spec's ground truth for the ≤ cap regime. */
  private def uncapped(keyed: org.apache.spark.sql.DataFrame) = {
    val a = keyed.select(col("key"), col("id").as("doc_a"))
    val b = keyed.select(col("key"), col("id").as("doc_b"))
    a.join(b, Seq("key")).where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  test("degenerate block: candidates linear in n, every member anchored") {
    // 10⁴ ids sharing ONE block key — the boilerplate-identical crawl
    // mass no sub-banding can split (identical signatures). Uncapped
    // this is ~5·10⁷ pairs; capped it must be ≤ n·cap.
    val n = 10000
    val cap = 16
    val keyed = spark.range(n).select(lit("hot").as("key"), $"id")
    val pairs = Blocking.cappedPairs(keyed, "id", "doc_a", "doc_b", cap)
      .localCheckpoint(true)
    val cnt = pairs.count()
    assert(cnt <= n.toLong * cap, s"quadratic leak: $cnt pairs")
    // exact form: anchors all-pairs + each non-anchor × cap anchors
    assert(cnt == cap.toLong * (cap - 1) / 2 + (n - cap).toLong * cap)
    // connectivity: every non-anchor member pairs with every anchor,
    // so one CC pass recovers the whole duplicate mass
    val anchored = pairs.where($"doc_a" === 0).count()
    assert(anchored == n - 1, "member lost its anchor link")
  }

  test("blocks at or under the cap are bit-identical to the uncapped join") {
    // mixed organic corpus: many small blocks, ids in several blocks
    val keyed = spark.range(300)
      .select(concat_ws("-", lit("b"), pmod($"id" * 7919L, lit(40))).as("key"), $"id")
      .unionByName(spark.range(300)
        .select(concat_ws("-", lit("c"), pmod($"id" * 104729L, lit(60))).as("key"), $"id"))
    val capped = Blocking.cappedPairs(keyed, "id", "doc_a", "doc_b", cap = 64)
    val base = uncapped(keyed)
    assert(capped.exceptAll(base).isEmpty && base.exceptAll(capped).isEmpty,
      "cap changed an under-budget block")
  }

  test("directed variant emits both orders of every admitted pair") {
    val keyed = spark.range(50).select(lit("k").as("key"), $"id")
    val und = Blocking.cappedPairs(keyed, "id", "a", "b", cap = 8)
    val dir = Blocking.cappedPairsDirected(keyed, "id", "src", "dst", cap = 8)
    assert(dir.count() == 2 * und.count())
    assert(dir.where($"src" > $"dst").count() == und.count())
  }

  test("sf corpus: the production cap never binds (no organic band over budget)") {
    // every banded generator in the engine keys ≤ DefaultCap members
    // per organic block at test scale — the premise that lets the
    // oracle-replayed cap rule coexist with unchanged sf hashes
    val docs = DedupOps.shingled(graft.Tables.documents(spark, sfDir))
    val sigged = docs.select($"doc_id",
      graft.functions.VectorExpressions.minhash_sig(
        $"sh", graft.functions.Hashes.minhashParams(DedupOps.NumPerms)).as("sig"))
    val keyed = sigged.select($"doc_id",
      explode(graft.functions.Hashes.bandKeys(
        $"sig", DedupOps.Bands, DedupOps.RowsPerBand)).as("key"))
    val maxBand = keyed.groupBy($"key").count().agg(max($"count")).head().getLong(0)
    assert(maxBand <= DedupOps.BandCap,
      s"organic band of $maxBand exceeds cap ${DedupOps.BandCap}")
  }
}
