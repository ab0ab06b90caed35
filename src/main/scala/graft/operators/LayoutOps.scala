package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators: the write-path side of 100 TB efficiency.
  *
  * Scan pruning is the single biggest lever at petabyte scale — a
  * filter can only skip a file if the file's min/max envelope excludes
  * it, and that envelope is a property of HOW THE DATA WAS LAID OUT at
  * write time. Sorting by one column prunes that column perfectly and
  * every other column not at all; a Z-order (Morton) interleave trades
  * a little pruning on each dimension for bounded envelopes on ALL of
  * them (the Delta/Iceberg `ZORDER BY` trick — public docs describe
  * the same bit-interleave construction).
  */
object LayoutOps {
  import graft.SparkEntry.QueryFn

  /** 8-bit × 8-bit Morton interleave: x occupies even bit positions,
    * y odd — pure shifts/masks/ors, codegen'd, exact in any engine. */
  def morton8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Customer-axis divisor: custkey/64 fits 8 bits through sf0.1
    * (max custkey 15 000); a production job derives the divisor from
    * the column's min/max stats at write time. */
  val CustDiv = 64

  /** Z-order layout plan for `orders` over (customer, month): each
    * row's (custkey/64, month-index) buckets are bit-interleaved into
    * a Morton key and files are cut every 256 Morton values — so every
    * file covers at most a 16×16 block of the 256×256 key grid. The
    * report emits each file's row count and min/max envelope on BOTH
    * dimensions plus the envelope area — the number a pruning-aware
    * writer audits before committing a layout, and the proof that
    * both a `custkey BETWEEN` filter and an `orderdate BETWEEN` filter
    * skip most files (a single-column sort gives one or the other).
    *
    * Shape: bucket + interleave are map-side bit arithmetic at scan
    * speed; the report is one partial+final agg on file_id (≤ 256
    * keys). The actual write is `repartitionByRange(morton)` +
    * `sortWithinPartitions` — a single range shuffle, the same cost
    * as any global sort the writer would already pay. */
  val qZorderLayout: QueryFn = (s, dir) => {
    import s.implicits._
    val bucketed = Tables.orders(s, dir)
      .select(
        ($"o_custkey" / CustDiv).cast("long").bitwiseAND(255).as("xb"),
        ((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
          .cast("long").bitwiseAND(255).as("yb"))
    bucketed
      .select($"xb", $"yb", morton8($"xb", $"yb").as("z"))
      .select($"xb", $"yb", shiftright($"z", 8).as("file_id"))
      .groupBy($"file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"xb").as("cust_min"), max($"xb").as("cust_max"),
        min($"yb").as("month_min"), max($"yb").as("month_max"))
      .select($"file_id", $"n_rows",
        $"cust_min", $"cust_max", $"month_min", $"month_max",
        (($"cust_max" - $"cust_min" + 1) * ($"month_max" - $"month_min" + 1))
          .as("envelope_area"))
      .orderBy($"file_id")
  }

  /** The same (customer, month) bucketing as [[qZorderLayout]]. */
  private def bucketed(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.orders(s, dir).select(
      ($"o_custkey" / CustDiv).cast("long").bitwiseAND(255).as("xb"),
      ((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
        .cast("long").bitwiseAND(255).as("yb"))
  }

  /** Hilbert-curve layout plan over the same (customer, month) grid
    * as [[qZorderLayout]] — the locality upgrade: consecutive Hilbert
    * indices are always grid-ADJACENT (the Z-curve jumps across the
    * grid at power-of-two seams), so 256-value file cuts get tighter
    * two-dimensional envelopes and a range filter on either dimension
    * skips at least as many files. The index is the native codegen
    * [[graft.functions.Hilbert2DExpr]] — the 8-level rotate/flip
    * transform would blow up exponentially as composed when-chains —
    * and the oracle replays the identical integer transform as 8
    * unrolled SQL levels. LayoutRetrievalSpec asserts the mean
    * envelope area beats the Z-order layout's on the same data. */
  /** Target compacted-shard size for [[qCompactBinpack]] — 2 KiB on
    * the synthetic corpus gives a handful of bins per partition; a
    * production OPTIMIZE targets 128 MB-1 GB from table properties. */
  val CompactTarget = 2048L

  /** Small-file COMPACTION plan (r12 verdict #6b — the lakehouse
    * OPTIMIZE primitive next to the z-order/hilbert layout rows):
    * documents stand in for a partitioned table's small-file
    * manifest (file = doc, bytes = n_chars, partition = source), and
    * each PARTITION's files are bin-packed into ≥ [[CompactTarget]]
    * output shards with a deterministic next-fit-decreasing rule —
    * files ordered (bytes DESC, doc_id ASC), bin = running-sum-
    * before ÷ target (each bin fills to the target, the straddling
    * file overflows into the boundary; the descending order puts
    * big files first so tail bins pack the fragments — the
    * fill-ratio shape Delta/Iceberg OPTIMIZE bin-packing produces).
    * The report per (partition, bin): file count, total bytes, the
    * largest file, and the id span — what a compaction writer audits
    * before committing rewrites.
    *
    * Scale: the ONLY ordered scan is per PARTITION (window keyed by
    * source — PlanAudit pins no global window), exactly the unit a
    * real OPTIMIZE plans independently and in parallel; the report
    * is one partial+final agg on (source, bin). A global running sum
    * would single-thread the manifest at 100 TB — the per-partition
    * key is the load-bearing choice. */
  val qCompactBinpack: QueryFn = (s, dir) => {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("before", coalesce(sum($"n_chars").over(w), lit(0L)))
      .withColumn("bin", ($"before" / CompactTarget).cast("long"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_files"),
        sum($"n_chars").as("total_bytes"),
        max($"n_chars").as("max_file_bytes"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"source", $"bin")
  }

  val qHilbertLayout: QueryFn = (s, dir) => {
    import s.implicits._
    bucketed(s, dir)
      .select($"xb", $"yb",
        graft.functions.VectorExpressions.hilbert_2d($"xb", $"yb").as("h"))
      .select($"xb", $"yb", shiftright($"h", 8).as("file_id"))
      .groupBy($"file_id")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"xb").as("cust_min"), max($"xb").as("cust_max"),
        min($"yb").as("month_min"), max($"yb").as("month_max"))
      .select($"file_id", $"n_rows",
        $"cust_min", $"cust_max", $"month_min", $"month_max",
        (($"cust_max" - $"cust_min" + 1) * ($"month_max" - $"month_min" + 1))
          .as("envelope_area"))
      .orderBy($"file_id")
  }
}
