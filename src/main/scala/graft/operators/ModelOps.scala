package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Cols.{normTokens, rnd}
import graft.functions.VectorExpressions.fnv_shingles

/** Model-based quality scoring with the hashing trick — the
  * fastText-style linear classifier pass every pretraining corpus
  * runs (CCNet's LM filter, fastText quality/lang classifiers,
  * DCLM's fastText filter). The architecture is the product here:
  * features are hashed into a fixed 2^16-bucket space (no vocabulary
  * to build, broadcast, or shuffle — the model is position-addressed),
  * and scoring is a pure map over the corpus: tokenize → hash
  * unigrams+bigrams → look up bucket weights → mean → threshold.
  * Zero shuffles at any corpus size; 100 TB scores at scan speed.
  *
  * The weight table is a deterministic stand-in for trained
  * parameters: w(b) = Knuth-hash(b)/2^31 − 1 ∈ [−1, 1). Every
  * arithmetic step is integer or exact-binary (mask, multiply,
  * mod 2^32, divide by 2^31), so a second engine replays the model
  * bit-for-bit — which is what the DuckDB oracle does, through the
  * same FNV-1a feature hash the dedup stack already replays. A real
  * deployment swaps `bucketWeight` for a broadcast float array
  * learned offline; nothing else changes shape.
  */
object ModelOps {
  import graft.SparkEntry.QueryFn

  val Buckets = 65536 // 2^16 — mask, never %, on a signed hash
  val KnuthC = 2654435761L

  /** Deterministic pseudo-weight of a feature hash: low 16 bits
    * address the bucket, Knuth multiplicative mix spreads bucket id →
    * weight. All steps exact in 64-bit integers and binary doubles. */
  private def weight(h: Column): Column = {
    val b = h.bitwiseAND(lit((Buckets - 1).toLong))
    val m = (b * lit(KnuthC)) % lit(4294967296L)
    m.cast("double") / lit(2147483648.0) - lit(1.0)
  }

  /** Mean bucket weight over a hash-array column, decimal-exact so
    * engines agree regardless of accumulation order. */
  private def meanWeight(hashes: Column): Column =
    aggregate(
      transform(hashes, weight(_)),
      lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 10)),
      (acc, x) => (acc + x.cast(DecimalType(27, 10))).cast(DecimalType(38, 10)))
      .cast("double") / size(hashes)

  /** (doc_id, n_feats, score, keep) for every document: hashed
    * unigram+bigram features scored against the bucket weight table,
    * kept when the mean weight is positive (the sigmoid is monotone,
    * so thresholding the linear score IS the classifier decision —
    * and sidesteps cross-engine exp() last-ulp drift). */
  val textHashLr: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", normTokens($"text").as("tk"))
      .select($"doc_id",
        concat(fnv_shingles($"tk", 1), fnv_shingles($"tk", 2)).as("feats"))
      .where(size($"feats") > 0)
      .select($"doc_id",
        size($"feats").cast("long").as("n_feats"),
        rnd(meanWeight($"feats"), 6).as("score"))
      .withColumn("keep", $"score" > 0)
      .orderBy($"doc_id")
  }
}
