package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class TopKSpec extends SparkTestBase {

  test("TopK.perKey == window row_number form (events: top 3 values per type)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val got = TopK.perKey(ev,
        keyCols = Seq("event_type"),
        orderCols = Seq("value" -> false, "event_id" -> true),
        k = 3)
      .select($"event_type", $"event_id", $"value")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val w = Window.partitionBy($"event_type")
      .orderBy($"value".desc, $"event_id".asc)
    val expected = ev.withColumn("rn", row_number().over(w))
      .where($"rn" <= 3)
      .select($"event_type", $"event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    assert(got == expected)
    assert(got.size == 15) // 5 event types x top 3
  }

  test("physical plan: partial + final TopKPerKeyExec with one exchange between") {
    val df = TopK.perKey(Tables.events(spark, sfDir),
      Seq("event_type"), Seq("value" -> false), 2)
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    // AQE prints both the final and initial plans: 2 nodes in each
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan.take(600))
    assert(plan.contains("Exchange hashpartitioning(event_type"), plan.take(600))
  }

  test("keys with fewer than k rows are returned whole") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val got = TopK.perKey(tiny, Seq("k"), Seq("v" -> false), 5)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("partial pass stays within its key budget: 1e6 rows, 5e5 distinct keys, 1000-row cap") {
    // text_tfidf_top's shape — doc-grain keys, so the partial map
    // would otherwise hold ≈ every row of the partition. With the
    // budget at 1000 rows the map is capped at 1000 keys (k=1) and
    // flush-restarts; the final pass re-merges, so every key still
    // comes out exactly once with its true max.
    import spark.implicits._
    spark.conf.set("graft.topk.partialRowBudget", "1000")
    try {
      val df = spark.range(1000000L).select(
        (col("id") % 500000L).as("k"), col("id").as("v"))
      val got = TopK.perKey(df, Seq("k"), Seq("v" -> false), 1)
      assert(got.count() == 500000L) // one survivor per key despite flushes
      val sample = got.where(col("k") < 5).as[(Long, Long)].collect().toSet
      assert(sample == (0L until 5L).map(k => (k, k + 500000L)).toSet)
    } finally spark.conf.unset("graft.topk.partialRowBudget")
  }

  test("TopKRewrite: plain-SQL window top-k gets the heap plan, result unchanged") {
    val sql =
      """SELECT event_type, CAST(rn AS BIGINT) AS rn, event_id
        |FROM (SELECT event_type, event_id,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |      FROM events_v)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin
    graft.Tables.events(spark, sfDir).createOrReplaceTempView("events_v")
    TopK.enableRewrite(spark)
    val rewritten = spark.sql(sql)
    val gotRows = rewritten.collect().map(_.toString).toSeq
    assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "rewrite did not fire")
    // soundness: pop the rule, the naive plan must agree row-for-row
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == TopKRewrite)
    try {
      val naive = spark.sql(sql)
      assert(!naive.queryExecution.executedPlan.toString.contains("TopKPerKey"),
        "baseline unexpectedly rewritten")
      assert(naive.collect().map(_.toString).toSeq == gotRows,
        "rewrite changed the result")
    } finally spark.experimental.extraOptimizations = saved
  }
}
