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
  private[graft] def changeBatch(base: DataFrame): DataFrame = {
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
  private[graft] def merged(s: SparkSession, dir: String): DataFrame = {
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

  /** Incremental view maintenance — the third leg of the CDC stool
    * (merge maintains the TABLE, SCD2 the HISTORY; this maintains a
    * downstream AGGREGATE): the per-status (count, total) view is
    * updated from the change batch ALONE — remove each changed key's
    * old contribution (one delta⋈base equi-join fetches pre-images;
    * the batch side broadcasts), add its new one — without ever
    * rescanning the base. The oracle RECOMPUTES the view from the
    * fully merged snapshot, so the hash match IS the IVM correctness
    * theorem (maintained ≡ recomputed) — deltas accumulate in
    * DECIMAL, hence associativity can't leak through the shortcut.
    * At 100 TB this is the difference between touching |Δ| rows and
    * touching the corpus — why every warehouse does it. */
  val qIvmMaintain: QueryFn = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val baseAgg = base.groupBy(col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(27, 10))).as("tot"))
    val ch = changeBatch(base)
    val withOld = ch.join(
      base.select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("old_st"), col("o_totalprice").as("old_tp")),
      Seq("key"), "left")
    val removes = withOld.where(col("op").isin("update", "delete"))
      .select(col("old_st").as("st"), lit(-1L).as("dn"),
        (-col("old_tp")).cast(DecimalType(27, 10)).as("dt"))
    val adds = withOld.where(col("op") =!= "delete")
      .select(col("st"), lit(1L).as("dn"),
        col("tp").cast(DecimalType(27, 10)).as("dt"))
    val delta = removes.unionByName(adds)
      .groupBy(col("st")).agg(sum(col("dn")).as("dn"), sum(col("dt")).as("dt"))
    baseAgg.join(delta, Seq("st"), "full_outer")
      .select(col("st").as("o_orderstatus"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        rnd((coalesce(col("tot"), lit(0).cast(DecimalType(27, 10))) +
          coalesce(col("dt"), lit(0).cast(DecimalType(27, 10)))).cast("double"), 2)
          .as("total_price"))
      .where(col("n_rows") > 0)
      .orderBy(col("o_orderstatus"))
  }

  /** Point-in-time (AS OF) join against the SCD2 history — the query
    * the history table EXISTS for: each purchase event looks up the
    * attribute interval covering its timestamp ("what state was the
    * user in when they bought"), then folds to per-attribute
    * conversion counts and revenue. This is the warehouse PIT-join
    * pattern (fact ⋈ dimension FOR SYSTEM_TIME AS OF), composed
    * directly on [[qScd2History]]'s intervals so the two operators
    * provably share semantics.
    *
    * Shape: a user-keyed equi-join with the interval containment as
    * a residual predicate — fan-in bounded by per-user intervals ×
    * per-user purchases (the range-join discipline: never a global
    * inequality join); revenue decimal-accumulates. Every purchase
    * matches exactly ONE interval (they tile — spec-proven), which
    * the conservation check asserts. */
  val qPitJoin: QueryFn = (s, dir) => {
    import graft.functions.Cols.{rnd => rnd2}
    val hist = qScd2History(s, dir)
      .select(col("user_id"), col("attr"), col("valid_from_us"), col("valid_to_us"))
    val purchases = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"), col("value"))
    purchases.join(hist,
        purchases("user_id") === hist("user_id") &&
          col("valid_from_us") <= col("pus") &&
          (col("valid_to_us").isNull || col("pus") < col("valid_to_us")))
      .groupBy(col("attr").as("state_at_purchase"))
      .agg(count(lit(1)).as("n_purchases"),
        rnd2(xsum(col("value")), 2).as("revenue"))
      .orderBy(col("state_at_purchase"))
  }

  /** Snapshot DIFF — the data-diff op every migration/backfill review
    * runs before swapping tables: base vs merged snapshot full-outer
    * joined on the key, every row classified
    * inserted/deleted/updated/unchanged, with per-column change
    * counts for the updated class (which column moved — the "what
    * did this backfill actually touch" answer). One equi-join + one
    * 4-row fold; at 100 TB both sides shuffle on the key once, AQE
    * handles the skew, and nothing else moves.
    *
    * Exactness: update detection compares the exact doubles the
    * derivation produced — bit-identical cross-engine, so even the
    * changed-column counts hash-verify. */
  val qSnapshotDiff: QueryFn = (s, dir) => {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("b_st"), col("o_totalprice").as("b_tp"))
    val next = merged(s, dir)
      .select(col("key"), col("st").as("n_st"), col("tp").as("n_tp"))
    base.join(next, Seq("key"), "full_outer")
      .select(
        when(col("b_st").isNull, "inserted")
          .when(col("n_st").isNull, "deleted")
          .when(col("b_st") =!= col("n_st") || col("b_tp") =!= col("n_tp"), "updated")
          .otherwise("unchanged").as("change"),
        when(col("b_st") =!= col("n_st"), 1L).otherwise(0L).as("st_chg"),
        when(col("b_tp") =!= col("n_tp"), 1L).otherwise(0L).as("tp_chg"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("st_chg")).as("n_status_changed"),
        sum(col("tp_chg")).as("n_price_changed"))
      .orderBy(col("change"))
  }

  /** Slowly-changing-dimension type-2 build — the OTHER half of the
    * CDC story: `q_merge_upsert` maintains the CURRENT snapshot;
    * this builds the full HISTORY table (versioned validity
    * intervals) from the same change stream. Each user's event_type
    * is treated as the tracked attribute: consecutive duplicates
    * collapse (no-op changes produce no version), and each surviving
    * change opens an interval [valid_from, valid_to) closed by the
    * next change — the open interval (valid_to null) is the current
    * row, exactly the shape a warehouse dimension join expects.
    *
    * Spark shape: two user-keyed windows over the same (ts,
    * event_id) total order — a lag to collapse no-ops, then
    * lead + row_number over the collapsed set for interval close and
    * version number. Both windows share the user partition key, so
    * the corpus shuffles ONCE on user_id and both sorts ride the
    * same exchange. Validity bounds are epoch-microsecond BIGINTs —
    * exact, engine-neutral, and what a downstream range join wants. */
  val qScd2History: QueryFn = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val collapsed = ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
    collapsed
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("attr"),
        unix_micros(col("ts")).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }
}
