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
