package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Cols.{asDouble, rnd, xsum}

/** Distributed Lloyd's k-means over the embeddings table — the
  * clustering pass a curation pipeline runs for topic bucketing /
  * diversity sampling (and the training step behind the IVF index in
  * [[AnnOps]]).
  *
  * Scale shape per iteration (the classic Spark k-means, same as
  * MLlib's): centroids are k×dim doubles — broadcast-small — so
  * ASSIGNMENT is a map-side argmin over literal centroid arrays (zero
  * shuffle, whole corpus streamed once), and RECOMPUTE is one
  * partial+final aggregation on (cluster, dim) — 512 keys — whose
  * result is collected to the driver (k×dim values, not corpus data)
  * to become the next round's literals. Nothing corpus-sized ever
  * moves; 3 fixed iterations = 3 corpus scans.
  *
  * Determinism (the reason this has a SQL oracle, unlike most k-means
  * implementations): init is vec_id < k, iteration count is fixed,
  * distances accumulate per-dim squares in DECIMAL(38,10) (exact, so
  * partial-agg order can't flip an argmin), ties break to the lower
  * cluster id, and centroid means divide the exact decimal sum in
  * double. Both engines therefore compute bit-identical centroids and
  * assignments at every round.
  */
object KMeansOps {
  import graft.SparkEntry.QueryFn

  /** k is a PER-RUN DIAL (the GRAFT_ANN_* discipline), not a literal:
    * a production launch sets `GRAFT_KMEANS_K` ≈ corpus / target cell
    * size, so the semantic-dedup pair space Σnᵢ² stays ≈ n · target
    * as the corpus grows — the docstring's "k scales with corpus
    * size" as a mechanism instead of a promise (r9 verdict #2's
    * constant-k was the first of dedup_semantic's three
    * scale-killers). The oracle unroll interpolates THIS accessor
    * (`vec_id < k` init is k-generic), so a dialed run stays
    * hash-green; default 8 preserves every gate hash. Test-visible
    * override, same as [[AnnOps.overrideNumProbes]]. */
  @volatile var overrideK: Option[Int] = None
  def K: Int = overrideK
    .orElse(sys.env.get("GRAFT_KMEANS_K").map(_.toInt)).getOrElse(8)
  val Iters = 3

  /** Exact squared L2 distance to a literal centroid: per-dim squared
    * differences are bit-identical doubles in any engine; accumulating
    * them in decimal (scale 10, like [[xsum]]) removes the last-ulp
    * association noise a double fold would leave. */
  private def d2(emb: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(emb, lit(c), (x, cv) => (x - cv) * (x - cv)),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 10)),
      (acc, x) => (acc + x.cast(DecimalType(27, 10))).cast(DecimalType(38, 10)))
      .cast("double")

  /** Map-side argmin: array of (distance, cluster) structs, array_min
    * picks the lexicographic minimum — lowest distance, ties to the
    * lowest cluster id. */
  private def assign(emb: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(d2(emb, c).as("d"), lit(i).as("c"))
    }: _*))

  /** The fitted centroids after `iters` exact Lloyd's iterations —
    * k×dim doubles, the broadcastable model other operators build on
    * ([[DedupOps.dedupSemantic]] buckets its pairwise pass with them). */
  def fitCentroids(s: SparkSession, dir: String,
      k: Int = K, iters: Int = Iters): Array[Array[Double]] = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", asDouble($"embedding").as("emb"))

    // init: the first k vectors by vec_id (k×dim doubles on the driver
    // — the broadcast payload, not corpus data)
    var cents: Array[Array[Double]] = emb
      .where($"vec_id" < k).orderBy($"vec_id")
      .select($"emb").as[Seq[Double]].collect().map(_.toArray)
    require(cents.length == k, s"need $k init vectors")

    for (_ <- 1 until iters) {
      val assigned = emb.select($"vec_id", $"emb", assign($"emb", cents).as("a"))
      // recompute: one (cluster, dim) aggregation — 512 keys, partial
      // agg before the shuffle; collect is k×dim, never corpus-sized
      val sums = assigned
        .select($"a.c".as("cluster"), posexplode($"emb").as(Seq("dim", "v")))
        .groupBy($"cluster", $"dim")
        .agg(xsum($"v").as("sv"), count(lit(1)).as("n"))
        .collect()
      val next = Array.fill(k)(new Array[Double](cents(0).length))
      val seen = Array.fill(k)(false)
      sums.foreach { r =>
        val c = r.getInt(0); seen(c) = true
        next(c)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      require(seen.forall(identity), "empty cluster — lower k or reseed")
      cents = next
    }
    cents
  }

  /** (vec_id, embedding, cluster_id, d2) for every vector under the
    * fitted model — assignment is the same zero-shuffle map-side
    * argmin over literal centroids as the training rounds. */
  def assignments(s: SparkSession, dir: String,
      k: Int = K, iters: Int = Iters): DataFrame = {
    import s.implicits._
    val cents = fitCentroids(s, dir, k, iters)
    Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding",
        assign(asDouble($"embedding"), cents).as("a"))
      .select($"vec_id", $"embedding",
        $"a.c".cast("long").as("cluster_id"), $"a.d".as("d2"))
  }

  def kmeans(s: SparkSession, dir: String, k: Int = K, iters: Int = Iters): DataFrame = {
    import s.implicits._
    assignments(s, dir, k, iters)
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"), rnd(xsum($"d2") / count(lit(1)), 4).as("mean_d2"))
      .orderBy($"cluster_id")
  }

  /** Cluster-size + within-cluster-spread report after 3 exact Lloyd's
    * iterations (init = vec_id < 8). */
  val embKmeans: QueryFn = (s, dir) => kmeans(s, dir)
}
