package graft.operators

import graft.SparkTestBase

/** [[AnnOps.annBqTopk]]: the 1-bit stage must actually work as a
  * shortlist — recall@k of the BQ serve against the exact brute-force
  * top-k on the real corpus, plus the structural contracts (k rows
  * per probe, rank order consistent with the reported sims). */
class BqSpec extends SparkTestBase {
  import spark.implicits._

  test("binary-quantization serve: k rows per probe, recall floor vs brute force") {
    val bq = AnnOps.annBqTopk(spark, sfDir)
      .select($"pid", $"nid").as[(Long, Long)].collect().toSet
    val bf = AnnOps.annBruteforceTopk(spark, sfDir)
      .select($"pid", $"nid").as[(Long, Long)].collect().toSet
    assert(bf.size == AnnOps.K * AnnOps.NumProbes)
    assert(bq.size == AnnOps.K * AnnOps.NumProbes,
      s"BQ must return a full top-k per probe, got ${bq.size}")
    val recall = (bq intersect bf).size.toDouble / bf.size
    // near-random 64-dim embeddings are the WORST case for sign
    // quantization (no cluster structure to preserve) — a 64-wide
    // shortlist still has to beat chance by a wide margin. Real
    // corpora with semantic structure sit far higher.
    assert(recall >= 0.4, s"BQ recall@${AnnOps.K} = $recall below floor")
  }
}
