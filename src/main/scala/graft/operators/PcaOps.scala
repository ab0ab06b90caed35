package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Cols.{asDouble, rnd, xsum}

/** Distributed PCA (top principal component) via power iteration over
  * the embeddings table — the dimensionality probe a curation pipeline
  * runs before whitening / anisotropy correction of an embedding
  * space, and the building block for spectral diversity sampling.
  *
  * Scale shape per iteration (the matrix-free power method — the
  * covariance matrix is NEVER materialized, which at dim d would be a
  * d² driver object): the current direction v is d doubles —
  * broadcast-small — so the PROJECT step (sᵢ = (xᵢ−μ)·v) is a
  * map-side dot product against literal v (zero shuffle, whole corpus
  * streamed once), and the UPDATE step (w = Σᵢ sᵢ(xᵢ−μ)) is one
  * partial+final aggregation on dim — 64 keys — whose result is
  * collected to the driver (d values, not corpus data) to be
  * normalized into the next round's literals. Nothing corpus-sized
  * ever moves; 3 fixed iterations = 3 corpus scans. This is exactly
  * how a 1000-executor job fits 100 TB of embeddings: per-round
  * traffic is O(partitions × dim), independent of row count.
  *
  * Determinism (the reason this has a full SQL-unroll oracle, same
  * discipline as [[KMeansOps]]): init is the exact-binary constant
  * v₀ = 1/8 per dim, iteration count is fixed, every cross-row sum
  * (mean, projections, update vector) accumulates per-term double
  * products in DECIMAL(27,10) — exact, so partial-agg order can't
  * perturb a digit — and the driver-side normalization folds w²
  * left-to-right in dim order, matching the oracle's
  * `list_reduce(list(w*w ORDER BY dim))`. Both engines therefore
  * compute bit-identical loadings, scores, and eigenvalue.
  */
object PcaOps {
  import graft.SparkEntry.QueryFn

  val Iters = 3
  val TopN = 20

  /** Exact dot product against a literal vector: per-term products
    * are bit-identical doubles in any engine; accumulation in decimal
    * removes partial-agg association noise (see [[Cols.xsum]]). */
  private def decDot(arr: Column, lits: Array[Double]): Column =
    aggregate(
      zip_with(arr, lit(lits), (x, v) => x * v),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 10)),
      (acc, x) => (acc + x.cast(DecimalType(27, 10))).cast(DecimalType(38, 10)))
      .cast("double")

  /** Centered embedding against the literal mean. */
  private def centered(emb: Column, mu: Array[Double]): Column =
    zip_with(emb, lit(mu), (x, m) => x - m)

  /** (mean, component, eigenvalue) after `iters` exact power rounds.
    * The eigenvalue estimate is ‖Σᵢ sᵢ(xᵢ−μ)‖ / (n−1) of the final
    * round — the Rayleigh quotient vᵀΣv since v entering the round is
    * unit-norm. */
  def fit(s: SparkSession, dir: String, iters: Int = Iters)
      : (Array[Double], Array[Double], Double) = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", asDouble($"embedding").as("emb"))

    // mean: one (dim) aggregation — 64 keys, partial agg before the
    // exchange; the collect is dim doubles, never corpus-sized
    val dims = emb.select(posexplode($"emb").as(Seq("dim", "v")))
      .groupBy($"dim")
      .agg(xsum($"v").as("sv"), count(lit(1)).as("n"))
      .collect()
    val dim = dims.length
    val n = dims.head.getLong(2)
    val mu = new Array[Double](dim)
    dims.foreach(r => mu(r.getInt(0)) = r.getDouble(1) / r.getLong(2))

    // v0 = 1/8 per dim: exactly representable in binary, so both
    // engines start from the identical direction
    var v = Array.fill(dim)(0.125)
    var eig = 0.0
    for (_ <- 1 to iters) {
      val ce = emb.select($"vec_id", centered($"emb", mu).as("c"))
      // project (map-side, literal v) then update: one (dim) agg.
      // Two-step select on purpose: the dot product must materialize
      // BEFORE the generate — fused into the posexplode select,
      // Catalyst re-evaluates the (interpreted HOF) dot once per
      // exploded row, a 64× blowup (measured 14 s → 3 s at sf0.1).
      val scored = ce.select($"c", decDot($"c", v).as("s"))
      val w = scored.select($"s", posexplode($"c").as(Seq("dim", "cv")))
        .groupBy($"dim")
        .agg(xsum($"s" * $"cv").as("w"))
        .collect()
      val warr = new Array[Double](dim)
      w.foreach(r => warr(r.getInt(0)) = r.getDouble(1))
      // left-to-right fold in dim order — the oracle's list_reduce twin
      var ss = 0.0
      var i = 0
      while (i < dim) { ss += warr(i) * warr(i); i += 1 }
      val nrm = math.sqrt(ss)
      require(nrm > 0, "degenerate corpus: zero update vector")
      eig = nrm / (n - 1)
      v = warr.map(_ / nrm)
    }
    (mu, v, eig)
  }

  /** Scores every vector against the fitted component (map-side,
    * literal μ and v) and keeps the top `TopN` by |projection| — the
    * outlier probe: embeddings far along the dominant axis are the
    * cluster a diversity sampler caps first. Bounded top-k lowers to
    * TakeOrderedAndProject (no global sort materialization). */
  val embPcaPower: QueryFn = (s, dir) => {
    import s.implicits._
    val (mu, v, eig) = fit(s, dir)
    Tables.embeddings(s, dir)
      .select($"vec_id",
        decDot(centered(asDouble($"embedding"), mu), v).as("raw"))
      .select($"vec_id", rnd($"raw", 6).as("score"),
        rnd(abs($"raw"), 6).as("abs_score"))
      .withColumn("eigenvalue", rnd(lit(eig), 4))
      .orderBy($"abs_score".desc, $"vec_id".asc)
      .limit(TopN)
  }
}
