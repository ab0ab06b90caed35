package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class RankedSpec extends SparkTestBase {

  test("withGlobalRank == single-partition Window row_number (per-user counts)") {
    import spark.implicits._
    val counts = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("c"))

    val got = Ranked.withGlobalRank(
      counts, Seq($"c".asc, $"user_id".asc), "i")
    val expected = counts.withColumn("i",
      row_number().over(Window.orderBy($"c".asc, $"user_id".asc)).cast("long"))

    assert(got.n == counts.count())
    val g = got.df.select($"user_id", $"i").as[(Long, Long)].collect().toMap
    val e = expected.select($"user_id", $"i").as[(Long, Long)].collect().toMap
    assert(g == e)
  }

  test("running sums match the global cumulative window (concurrency sweep shape)") {
    import spark.implicits._
    val deltas = Tables.events(spark, sfDir)
      .select(unix_micros($"ts").as("us"),
        when($"event_id" % 2 === 0, 1L).otherwise(-1L).as("d"))

    val got = Ranked.withGlobalRank(
      deltas, Seq($"us".asc, $"d".desc), "rn", Seq(($"d", "run"))).df
    val expected = deltas.withColumn("run", sum($"d").over(
      Window.orderBy($"us".asc, $"d".desc)
        .rowsBetween(Window.unboundedPreceding, 0)))

    // (us, d) is not a total order (ties share both columns), so
    // compare the multiset of (us, d, run) — tied rows permute but
    // the prefix-value multiset is invariant since tied rows carry
    // identical deltas
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.select($"us", $"d", $"run").as[(Long, Long, Long)]
        .collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(got) == bag(expected))
  }

  test("no single-partition window in the plan; ranks spread over partitions") {
    import spark.implicits._
    val counts = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
    val got = Ranked.withGlobalRank(counts, Seq($"c".asc, $"user_id".asc), "i").df
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    // the window must be partitioned by the physical partition id,
    // never an empty partitionBy (= single-partition sort): every
    // windowspecdefinition in the plan must carry the __pid key
    val specs = "windowspecdefinition".r.findAllIn(plan).size
    val pidSpecs = "windowspecdefinition\\(__pid".r.findAllIn(plan).size
    assert(specs > 0 && specs == pidSpecs, plan.take(800))
  }

  test("rank/sum offsets fold correctly at every partition-count regime") {
    // 1 partition (no offsets), more partitions than rows (empties),
    // and a middling split — the three boundary regimes of the
    // per-partition offset fold
    import spark.implicits._
    val df = spark.range(0, 37).select(
      ($"id" % 7).as("v"), $"id".as("k"), ($"id" % 3 - 1).as("d"))
    val expected = df
      .withColumn("rn", row_number().over(
        Window.orderBy($"v".asc, $"k".asc)).cast("long"))
      .withColumn("run", sum($"d").over(Window.orderBy($"v".asc, $"k".asc)
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"k", $"rn", $"run").as[(Long, Long, Long)].collect().toSet
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (np <- Seq("1", "3", "64")) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        val rf = Ranked.withGlobalRank(df,
          Seq($"v".asc, $"k".asc), "rn", Seq(($"d", "run")))
        assert(rf.n == 37)
        val got = rf.df.select($"k", $"rn", $"run")
          .as[(Long, Long, Long)].collect().toSet
        assert(got == expected, s"np=$np")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("ceilBucket reproduces the explicit quintile formula at the edges") {
    for (n <- Seq(1L, 4L, 5L, 7L, 100L)) {
      val rows = spark.range(1, n + 1)
        .select(Ranked.ceilBucket(col("id"), 5, n).as("b"), col("id"))
        .collect()
      rows.foreach { r =>
        val rn = r.getLong(1)
        val want = math.floor((rn * 5 + n - 1).toDouble / n.toDouble).toLong
        assert(r.getLong(0) == want, s"n=$n rn=$rn")
      }
    }
  }
}
