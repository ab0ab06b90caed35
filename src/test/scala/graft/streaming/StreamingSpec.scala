package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class StreamingSpec extends SparkTestBase {

  test("streaming windowed agg == batch twin (counts, sums, HLL uniques)") {
    import spark.implicits._
    val stream = Streams.windowedAgg(Streams.eventsStream(spark, sfDir))
    val q = stream.writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_out")
      .select($"hour", $"event_type", $"n_events", $"sum_value", $"approx_users")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100), r.getLong(4))).toMap

    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"),
        approx_count_distinct($"user_id").as("u"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100), r.getLong(4))).toMap

    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("streaming dedup: one survivor per (user, type) key") {
    import spark.implicits._
    val deduped = Streams.streamingDedup(Streams.eventsStream(spark, sfDir))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out").count()
    val expected = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").distinct().count()
    assert(got == expected)
    assert(got > 0)
  }

  test("streaming sessionize: closed sessions + open state == batch session count") {
    import spark.implicits._
    // stream path: one micro-batch holding the whole finite table
    val sessions = Streams.sessionize(Streams.eventsStream(spark, sfDir))
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("sess_out")
      .groupBy($"user_id").agg(count(lit(1)).as("n_closed"))
      .as[(Long, Long)].collect().toMap

    // batch oracle: the oracle-checked q_events_sessionize counts ALL
    // sessions. A user's final session closes in-stream only via the
    // event-time timeout, which fires once the watermark (global max
    // ts - 30 min delay) passes last_event + 30 min gap; otherwise it
    // stays open in state: closed(u) == total(u) - 1.
    val total = graft.operators.Relational.qEventsSessionize(spark, sfDir)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toMap
    val lastEv = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(max(unix_micros($"ts")).as("last_us"))
      .as[(Long, Long)].collect().toMap
    val maxUs = lastEv.values.max

    assert(total.nonEmpty)
    total.foreach { case (u, n) =>
      val c = closed.getOrElse(u, 0L)
      val timedOut = lastEv(u) / 1000L + 1800000L < maxUs / 1000L - 1800000L
      val expected = if (timedOut) n else n - 1
      assert(c == expected,
        s"user $u: $c closed vs $n total sessions (timedOut=$timedOut)")
    }
  }

  test("sessionize also runs in batch mode (closed sessions = total - 1 per user)") {
    import spark.implicits._
    val batchSessions = Streams.sessionize(Tables.events(spark, sfDir))
    val perUser = batchSessions.groupByKey(_.user_id)
      .mapValues(_ => 1L).reduceGroups(_ + _).collect().toMap
    val oracle = graft.operators.Relational.qEventsSessionize(spark, sfDir)
      .select($"user_id", $"n_sessions").as[(Long, Long)].collect().toMap
    // batch mode discards trailing open state, so each user's final
    // session is unemitted — same contract as one streaming batch
    oracle.foreach { case (u, n) =>
      assert(perUser.getOrElse(u, 0L) == n - 1, s"user $u")
    }
  }
}
