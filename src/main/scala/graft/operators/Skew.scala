package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4).
  *
  * AQE's skew-join splitting handles moderate skew at runtime; these
  * are the explicit tools for the pathological cases a crawl-scale
  * pipeline hits (one hot key holding percent-level mass):
  *
  *  - [[saltedJoin]]: spread one hot join key over `factor` shuffle
  *    partitions by salting the big side and replicating the small
  *    side. Join semantics preserved for inner joins.
  *  - [[saltedDistinctCount]]: two-phase distinct count — the classic
  *    fix when one group holds most of the distinct values and a
  *    plain `count_distinct` funnels them through one reducer.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `key`, salting the big side into
    * `factor` sub-keys and replicating the small side once per salt.
    * The salt is a deterministic hash of the whole big-side row
    * (`xxhash64` over all columns), so results are stable run to run.
    * Use when `small` is too large to broadcast but `big`'s key
    * distribution is skewed. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val salts = small.sparkSession.range(factor.toLong)
      .select(col("id").cast("long").as("__salt"))
    val replicated = small.crossJoin(broadcast(salts))
    // shuffle_hash: this utility exists for the "small side too big to
    // broadcast" regime — letting Catalyst broadcast the replicated
    // side here would silently defeat the salt under test
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** `count(DISTINCT valueCol)` per `groupCol`, computed as two
    * partial-friendly aggregations: distinct pairs first (spread over
    * hash partitions of (group, value)), then a plain count per
    * group. Equivalent to the direct form; immune to one group
    * holding most values. */
  def saltedDistinctCount(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    df.select(groupCol.as("__g"), valueCol.as("__v"))
      .distinct()
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_distinct"))
}
