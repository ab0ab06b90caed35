package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols.{rnd, xsum, xavg}

/** Relational analytics surface (SURVEY.md §2.B).
  *
  * Design rules (100 TB posture):
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    explicitly `broadcast()` — no shuffle of the fact side;
  *  - fact-side filters appear before joins so Catalyst pushes them
  *    into the parquet scan;
  *  - every top-k is rank-limited with a deterministic tiebreak, never
  *    a bare `LIMIT` over an unordered set;
  *  - doubles that reach the output are rounded on both the Spark and
  *    oracle side to kill float-association noise.
  */
object Relational {
  import graft.SparkEntry.QueryFn

  /** TPC-H Q1-style pricing summary: single scan, partial+final agg. */
  val q1PricingSummary: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        rnd(sum($"l_quantity"), 2).as("sum_qty"),
        rnd(xsum($"l_extendedprice"), 2).as("sum_base_price"),
        rnd(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        rnd(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        rnd(avg($"l_quantity"), 2).as("avg_qty"),
        rnd(xavg($"l_extendedprice"), 2).as("avg_price"),
        rnd(xavg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6-style: highly selective scan — filters push to parquet. */
  val q6ForecastRevenue: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) &&
        $"l_quantity" < 24)
      .agg(rnd(xsum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  /** TPC-H Q3-style shipping priority: broadcast customer dim, shuffle
    * join orders⋈lineitem on orderkey, top-10 by revenue. */
  val q3ShippingPriority: QueryFn = (s, dir) => {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(s, dir).filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val li   = Tables.lineitem(s, dir).filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(rnd(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .select(
        $"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
        $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join, dims broadcast, region filter applied
    * before the join chain. */
  val q5LocalSupplier: QueryFn = (s, dir) => {
    import s.implicits._
    val reg  = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val nat  = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir)
    val sup  = Tables.supplier(s, dir)
    val ord = Tables.orders(s, dir).filter(
      $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
      $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(rnd(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name".asc)
  }

  /** Window rank: top-5 customers by lifetime order value per segment. */
  val qTopCustomersPerSegment: QueryFn = (s, dir) => {
    import s.implicits._
    val totals = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(rnd(xsum($"o_totalprice"), 2).as("total_spent"))
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"total_spent".desc, $"c_custkey".asc)
    Tables.customer(s, dir)
      .join(totals, $"c_custkey" === $"o_custkey")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .select($"c_mktsegment", $"rnk", $"c_custkey", $"c_name", $"total_spent")
      .orderBy($"c_mktsegment", $"rnk")
  }

  /** TPC-H Q4-style: EXISTS → left-semi join (late-shipped orders). */
  val qOrderPriority: QueryFn = (s, dir) => {
    import s.implicits._
    val ord = Tables.orders(s, dir).filter(
      $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
      $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    ord.join(li,
        $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** NOT EXISTS → left-anti join: parts that never shipped in bulk
    * (no lineitem at quantity ≥ 49). The plain "never ordered" form
    * is permanently empty on this generator — every part has
    * lineitems — and a 0-row result verifies nothing; the bulk
    * variant keeps the identical anti-join plan with a real answer. */
  val qPartsNeverOrdered: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.part(s, dir)
      .join(Tables.lineitem(s, dir).where($"l_quantity" >= 49),
        $"p_partkey" === $"l_partkey", "left_anti")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy($"p_brand")
  }

  /** ROLLUP over (nation, order year) — multi-level agg in one pass. */
  val qNationRevenueRollup: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", year($"o_orderdate").cast("long").as("order_year"))
      .agg(rnd(xsum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"n_name".asc_nulls_first, $"order_year".asc_nulls_first)
  }

  /** TPC-H Q13-style two-phase agg: orders per customer → histogram. */
  val qCustomerDistribution: QueryFn = (s, dir) => {
    import s.implicits._
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Hourly event rollup — batch twin of streaming.WindowedAgg. */
  val qEventsWindowed: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        rnd(xsum($"value"), 2).as("sum_value"),
        count_distinct($"user_id").as("n_users"))
      .orderBy($"hour", $"event_type")
  }

  /** Gap-based sessionization (30 min) via lag window + flag-sum.
    * Batch twin of streaming.Sessionize (flatMapGroupsWithState). */
  val qEventsSessionize: QueryFn = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val gap = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
    Tables.events(s, dir)
      .withColumn("new_session", when(gap.isNull || gap > 1800L * 1000000L, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(
        sum($"new_session").as("n_sessions"),
        count(lit(1)).as("n_events"),
        rnd(xsum($"value"), 2).as("sum_value"))
      .orderBy($"user_id")
  }

  /** Per-event-type top-3 users by total value (rank window). */
  val qEventsTopkUsers: QueryFn = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"total_value".desc, $"user_id".asc)
    Tables.events(s, dir)
      .groupBy($"event_type", $"user_id")
      .agg(rnd(xsum($"value"), 2).as("total_value"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"event_type", $"rnk", $"user_id", $"total_value")
      .orderBy($"event_type", $"rnk")
  }

  /** Top-3 raw events per type through the native TopKPerKey operator
    * (graft.plans) — partial per-partition heaps, shuffle of ≤ k rows
    * per (partition, key), final merge; no per-partition total sort. */
  val qEventsTopkNative: QueryFn = (s, dir) => {
    import s.implicits._
    graft.plans.TopK
      .perKey(Tables.events(s, dir),
        keyCols = Seq("event_type"),
        orderCols = Seq("value" -> false, "event_id" -> true),
        k = 3)
      .select($"event_type", $"event_id", $"value")
      .orderBy($"event_type", $"value".desc, $"event_id".asc)
  }

  /** Semi-structured extraction: JSON props → typed column → agg. */
  val qEventsJsonExtract: QueryFn = (s, dir) => {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(
        rnd(avg($"k"), 4).as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }
}
