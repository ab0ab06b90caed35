package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[DedupOps.restrictedComponents]] (r8 — pipeline_curate's one-pass
  * survivor CC) against the general star-contraction
  * [[DedupOps.connectedComponents]]: the two must label any
  * RESTRICTION of the memoized full-corpus pair graph identically —
  * the full-label grouping must cut no restricted edge, the per-group
  * union-find must produce component minima, and untouched universe
  * docs must label themselves. Runs on the real sf corpus so the
  * memoized chain (the function's contract input) is the production
  * one, across several restriction predicates including ones that
  * break connectivity through excluded docs. */
class RestrictedCcSpec extends SparkTestBase {
  import spark.implicits._

  test("restrictedComponents == connectedComponents on survivor restrictions") {
    val universeAll = graft.Tables.documents(spark, sfDir).select($"doc_id")
    val fullPairs = DedupOps.sharedPairs(spark, sfDir)
      .select($"doc_a", $"doc_b").localCheckpoint(true)
    // predicates chosen to exercise: dense keep, sparse keep (likely
    // breaks connectivity through excluded docs), parity split, and
    // a hash-based irregular keep
    val keeps: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
      "mod3"   -> (c => c % 3 =!= 0),
      "sparse" -> (c => c % 5 === 1),
      "parity" -> (c => c % 2 === 0),
      "hash"   -> (c => pmod(xxhash64(c), lit(7)) < 4))
    for ((name, keep) <- keeps) {
      val universe = universeAll.where(keep($"doc_id")).localCheckpoint(true)
      val ids = universe.select($"doc_id")
      val pairs = fullPairs
        .join(ids.select($"doc_id".as("doc_a")), "doc_a")
        .join(ids.select($"doc_id".as("doc_b")), "doc_b")
        .select($"doc_a", $"doc_b")
      val fast = DedupOps.restrictedComponents(spark, sfDir, pairs, universe)
        .as[(Long, Long)].collect().toMap
      val ref = DedupOps.connectedComponents(pairs, universe)
        .as[(Long, Long)].collect().toMap
      assert(fast == ref,
        s"[$name] labels diverge: " +
          (fast.toSet diff ref.toSet).take(5).toString + " vs " +
          (ref.toSet diff fast.toSet).take(5).toString)
      assert(fast.nonEmpty, s"[$name] vacuous restriction")
    }
  }
}
