package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._
import graft.functions.Hashes._
import graft.functions.VectorExpressions.cosine_sim

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.D).
  *
  * Scale shape: the probe set is always the small side — broadcast it;
  * the corpus side streams map-side. Ranking is rank-within-probe
  * (`row_number` partitioned by probe), so the shuffle is O(probes ×
  * candidates), never a global sort. Ties are broken on a *rounded*
  * similarity (1e-6) then vec_id, so rank order is stable across
  * engines and float-association noise.
  */
object AnnOps {
  import graft.SparkEntry.QueryFn

  val K = 5
  val NumProbes = 10

  private def probes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .where($"vec_id" < NumProbes)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
  }

  private def rankTopK(cands: DataFrame, k: Int): DataFrame = {
    // heavy phase: native TopKPerKey (bounded heaps, ≤k rows per
    // (partition, probe) shuffled) instead of a window sort over
    // every candidate; the row_number afterwards only ranks the
    // k·probes survivors
    val topped = graft.plans.TopK.perKey(
      cands.withColumn("sim_r", rnd(col("sim"), 6)),
      keyCols = Seq("pid"),
      orderCols = Seq("sim_r" -> false, "nid" -> true),
      k = k)
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("sim_r").desc, col("nid").asc)
    topped
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("pid"), col("rnk"), col("nid"), rnd(col("sim"), 4).as("sim"))
      .orderBy(col("pid"), col("rnk"))
  }

  /** Exact top-k by brute force: the correctness baseline (and the
    * oracle for the approximate variants' recall specs). */
  val annBruteforceTopk: QueryFn = (s, dir) => {
    import s.implicits._
    val cands = Tables.embeddings(s, dir)
      .join(broadcast(probes(s, dir)), $"vec_id" =!= $"pid")
      .select($"pid", $"vec_id".as("nid"), cosine_sim($"pe", $"embedding").as("sim"))
    rankTopK(cands, K)
  }

  /** LSH-bucketed top-k: candidates share >= 1 of four 4-bit bands of
    * a 16-plane sign signature; exact cosine only within candidates.
    * The scale path — candidate count per probe is corpus_fraction ×
    * bucket collision rate, not the whole corpus. */
  val annLshTopk: QueryFn = (s, dir) => {
    import s.implicits._
    val planes = hyperplanes(16, 64)
    val sig = hyperplaneSig(planes)
    val corpus = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding", sig($"embedding").as("sig"))
    val bandCols = (0 until 4).map { b =>
      concat_ws(":", lit(b), shiftrightunsigned(col("sig"), b * 4) % 16).as(s"band$b")
    }
    def banded(df: DataFrame, idCol: String, embCol: String) = df
      .select(col(idCol), col(embCol), explode(array(bandCols: _*)).as("key"))
    val p = banded(probes(s, dir).withColumn("sig", sig($"pe")), "pid", "pe")
    val c = banded(corpus, "vec_id", "embedding")
    val cands = p.join(c, Seq("key"))
      .where($"vec_id" =!= $"pid")
      .select($"pid", $"vec_id".as("nid"), $"pe", $"embedding").distinct()
      .select($"pid", $"nid", cosine_sim($"pe", $"embedding").as("sim"))
    rankTopK(cands, K)
  }

  val IvfProbeCells = 3

  /** IVF top-k: coarse quantizer = per-label centroids (a single agg —
    * at real scale, a k-means fit on a sample); every vector is
    * assigned to its nearest centroid once (map-side vs broadcast
    * centroids); probes search only their `IvfProbeCells` nearest
    * cells. */
  val annIvfTopk: QueryFn = (s, dir) => {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // centroid per label: elementwise mean of 64-dim float arrays
    val dim = 64
    val centroids = emb
      .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos").agg(avg($"x").as("m"))
      .groupBy($"label").agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
      .select($"label".as("cell"), transform($"pm", p => p.getField("m")).as("centroid"))
    val cellsB = broadcast(centroids)
    // nearest cell per corpus vector (rank-1 over the small cell set)
    val byDist = Window.partitionBy($"vec_id")
      .orderBy(rnd(cosine_sim($"embedding", $"centroid"), 6).desc, $"cell".asc)
    val assigned = emb.crossJoin(cellsB)
      .withColumn("r", row_number().over(byDist))
      .where($"r" === 1)
      .select($"vec_id", $"embedding", $"cell")
    // probes explode to their top `IvfProbeCells` cells
    val pByDist = Window.partitionBy($"pid")
      .orderBy(rnd(cosine_sim($"pe", $"centroid"), 6).desc, $"cell".asc)
    val probeCells = probes(s, dir).crossJoin(cellsB)
      .withColumn("r", row_number().over(pByDist))
      .where($"r" <= IvfProbeCells)
      .select($"pid", $"pe", $"cell")
    val cands = probeCells.join(assigned, Seq("cell"))
      .where($"vec_id" =!= $"pid")
      .select($"pid", $"vec_id".as("nid"), cosine_sim($"pe", $"embedding").as("sim"))
    rankTopK(cands, K)
  }
}
