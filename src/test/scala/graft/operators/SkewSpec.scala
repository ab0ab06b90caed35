package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SkewSpec extends SparkTestBase {

  test("saltedJoin == plain inner join (orders ⋈ customer)") {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = orders.join(cust, "o_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", factor = 7)
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(plain.values.sum == orders.count())
  }

  test("AQE splits a skewed fact-fact join at runtime (SURVEY §4 claim)") {
    // manual salting (above) is the planned path for KNOWN hot keys;
    // this proves the claimed runtime complement: AQE detects the
    // skewed shuffle partition and splits it, no query change needed.
    // Thresholds are scaled down to test size — the mechanism (split
    // when partition > factor × median and > threshold) is identical
    // at 100 TB with production defaults.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      // one pathological key carrying ~200× the median partition mass
      val hot = spark.range(200000).select(lit(0L).as("k"), $"id".as("v"))
      val rest = spark.range(1000).select(($"id" % 100 + 1).as("k"), $"id".as("v"))
      val fact = hot.union(rest)
      val dim = spark.range(101).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS Dataset's QueryExecution — write.save() and even
      // count() plan a fresh one and leave this AdaptiveSparkPlan
      // un-finalized; collect() is the action that finalizes it
      assert(joined.collect().length == 200000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join as skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("saltedDistinctCount == count_distinct (users per event type)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy($"event_type")
      .agg(count_distinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(ev, $"event_type", $"user_id")
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }
}
