package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** asofBackward checked against an independent brute-force
  * formulation (inequality join + max), plus the same-instant
  * visibility convention on hand-built rows. */
class AsOfSpec extends SparkTestBase {

  test("q_asof_join == brute-force max(o_orderdate <= ts) per event") {
    import spark.implicits._
    val got = AsOf.qAsofJoin(spark, sfDir)
      .as[(Long, Long, Option[String], Option[Long])].collect()
    assert(got.nonEmpty)

    val ev = Tables.events(spark, sfDir).select($"user_id", $"event_id", $"ts")
    val od = Tables.orders(spark, sfDir)
      .select($"o_custkey".as("user_id"), $"o_orderdate")
    val brute = ev.join(od, Seq("user_id"), "left")
      .where($"o_orderdate".isNull || $"o_orderdate" <= $"ts")
      .groupBy($"user_id", $"event_id")
      .agg(max($"o_orderdate").as("od"), max($"ts").as("ts"))
      .select($"user_id", $"event_id",
        date_format($"od", "yyyy-MM-dd").as("last_order_date"),
        datediff(to_date($"ts"), to_date($"od")).cast("long").as("days_since"))
      .as[(Long, Long, Option[String], Option[Long])].collect()
    // brute force drops events whose user has orders but none prior —
    // align on the common key set, then every present match must agree
    val gotMap = got.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val bruteMap = brute.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    bruteMap.foreach { case (k, v) => assert(gotMap(k) == v, s"key $k") }
    assert(gotMap.keySet.size >= bruteMap.keySet.size)
    // non-vacuous: matches exist and at least the full-corpus row count
    assert(got.count(_._3.isDefined) > 0)
  }

  test("asofBackward: same-instant right row is visible; no prior row -> null") {
    import spark.implicits._
    val t = (s: String) => Timestamp.valueOf(s)
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), "e1"), // exact tie with r@10:00
      (1L, t("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, t("2024-01-02 00:00:00"), "e2")  // user with no right rows
    ).toDF("k", "lt", "name")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 11:00:00"), 200L)
    ).toDF("k", "rt", "payload")
    val out = AsOf.asofBackward(left, right, "k", "lt", "rt", Seq("payload"))
      .select($"name", $"payload").as[(String, Option[Long])].collect().toMap
    assert(out("e1").contains(100L)) // >= convention: tie matches
    assert(out("e0").isEmpty)
    assert(out("e2").isEmpty)
  }
}
