package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HnswSpec extends SparkTestBase {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select(col("pid"), col("nid")).as[(Long, Long)].collect().toSet
  }

  test("beam serve recall@5 vs brute force, compared with IVF-PQ on the same probes") {
    val truth = topkSet(AnnOps.annBruteforceTopk(spark, sfDir))
    val hnsw = topkSet(HnswOps.annHnswTopk(spark, sfDir))
    val ivfpq = topkSet(AnnOps.annIvfPqTopk(spark, sfDir))
    val rHnsw = (hnsw & truth).size.toDouble / truth.size
    val rIvfPq = (ivfpq & truth).size.toDouble / truth.size
    info(f"recall@5: hnsw=$rHnsw%.3f ivfpq=$rIvfPq%.3f (same ${AnnOps.NumProbes} probes)")
    // bars at measured − 0.1 (the repo's recall-bar policy; measured
    // 0.84 hnsw / 0.74 ivfpq at sf0.001 — the per-IVF-cell medoid
    // entry points took hnsw from 0.70 to 0.84). The test embeddings
    // are near-random — real corpora with neighborhood structure
    // navigate far better at the same (M, Beam, Hops)
    assert(rHnsw >= 0.74, f"hnsw recall regressed: $rHnsw%.3f")
    assert(rIvfPq >= 0.64, f"ivfpq recall regressed: $rIvfPq%.3f")
    // with data-dependent entries the graph serve must MATCH OR BEAT
    // the cell-probe family on identical probes (the r5 verdict bar)
    assert(rHnsw >= rIvfPq - 0.05,
      f"hnsw recall $rHnsw%.3f below ivfpq $rIvfPq%.3f")
  }

  test("graph invariants: bidirectional, bounded degree, no self loops") {
    import spark.implicits._
    val e = HnswOps.edges(spark, sfDir).as[(Long, Long)].collect().toSet
    assert(e.nonEmpty)
    assert(e.forall { case (a, b) => a != b }, "self loop")
    assert(e.forall { case (a, b) => e.contains((b, a)) }, "missing reverse edge")
    // pre-bidirectionalize each node keeps ≤ M out-edges, so the
    // merged degree is ≤ M + (nodes that kept me) — bounded by 2M in
    // expectation; assert the hard upper bound that matters: no node
    // explodes to corpus degree
    val deg = e.groupBy(_._1).map(_._2.size)
    assert(deg.max <= HnswOps.M * 10, s"degree blowup: ${deg.max}")
  }

  test("serve path scores only visited nodes (visited ≪ corpus at serve time)") {
    // the beam is Beam wide, expansions are beam × M per hop — the
    // final frame must stay exactly K rows per probe with rank 1..K
    import spark.implicits._
    val out = HnswOps.annHnswTopk(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val byPid = out.groupBy(_._1)
    assert(byPid.keySet == (0L until AnnOps.NumProbes.toLong).toSet)
    byPid.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to AnnOps.K.toLong))
    }
  }
}
