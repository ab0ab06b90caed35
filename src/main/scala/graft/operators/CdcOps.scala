package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols.{rnd, xsum}

/** MERGE INTO (upsert + delete) re-expressed Spark-first — the
  * snapshot-maintenance primitive behind every table format's CDC
  * path (Delta/Iceberg MERGE, Hudi upsert): a base snapshot merged
  * with a keyed change batch of inserts, updates, and delete
  * tombstones, producing the next snapshot.
  *
  * Spark shape: ONE full-outer equi-join on the key resolves all
  * three change kinds in a single pass — unmatched-left rows carry
  * forward, matched rows take the change's values (or drop, for a
  * tombstone), unmatched-right rows insert. No per-kind passes, no
  * driver loops. At scale the join shuffles both sides on the key;
  * AQE broadcasts the batch when it's small and splits skewed keys
  * when it isn't — exactly the plan a table format's MERGE compiles
  * to. The change batch here is DERIVED deterministically from the
  * base (keyed residue classes), which is what makes the whole merge
  * replayable by a second engine.
  */
object CdcOps {
  import graft.SparkEntry.QueryFn

  /** The deterministic change batch: ~10% updates (status 'X', price
    * ×1.1), ~1% deletes (tombstones), ~10% inserts (shifted keys that
    * provably miss the base key range, status 'N', price ×0.5). The
    * residue classes are disjoint (3 vs 7 mod 10-vs-100) so each key
    * appears at most once — a well-formed CDC batch. */
  private def changeBatch(base: DataFrame): DataFrame = {
    val upd = base.where(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey").as("key"), lit("update").as("op"),
        lit("X").as("st"), (col("o_totalprice") * 1.1).as("tp"))
    val del = base.where(col("o_orderkey") % 100 === 7)
      .select(col("o_orderkey").as("key"), lit("delete").as("op"),
        lit(null).cast("string").as("st"), lit(null).cast("double").as("tp"))
    val ins = base.where(col("o_orderkey") % 10 === 4)
      .select((col("o_orderkey") + 10000000L).as("key"), lit("insert").as("op"),
        lit("N").as("st"), (col("o_totalprice") * 0.5).as("tp"))
    upd.unionAll(del).unionAll(ins)
  }

  /** The merged snapshot: (key, st, tp) after applying the batch. */
  private[operators] def merged(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    base.join(changeBatch(base), base("o_orderkey") === col("key"), "full_outer")
      .select(
        coalesce(col("key"), col("o_orderkey")).as("key"),
        when(col("op") === "delete", lit(null).cast("string"))
          .when(col("op").isNotNull, col("st"))
          .otherwise(col("o_orderstatus")).as("st"),
        when(col("op") === "delete", lit(null).cast("double"))
          .when(col("op").isNotNull, col("tp"))
          .otherwise(col("o_totalprice")).as("tp"))
      .where(col("st").isNotNull)
  }

  /** Post-merge snapshot audit per status — proves counts moved the
    * way the batch dictates (base statuses shrink by deletes, 'X' and
    * 'N' appear) and the value column re-sums exactly. */
  val qMergeUpsert: QueryFn = (s, dir) =>
    merged(s, dir)
      .groupBy(col("st").as("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), rnd(xsum(col("tp")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))
}
