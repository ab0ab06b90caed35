package graft.mr

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** The chaos family's STREAMING face: the reference's `unreliable`
  * mode (mapreduce.go:465) drops RPCs while a job is IN FLIGHT; the
  * Structured-Streaming analogue is a task failure inside a
  * micro-batch — the state store must recover the attempt and the
  * emitted results must equal both the failure-free stream AND the
  * batch twin (exactly-once under faults, not just under restarts,
  * which StreamingSpec's checkpoint test already covers).
  *
  * Injection rides the same [[Chaos]]/[[ChaosPlugin]] hook as the
  * batch family — `onTaskStart` covers every micro-batch's stages,
  * including the stateful aggregation's state-store tasks where no
  * user code runs. */
class ChaosStreamingSpec extends SparkTestBase {

  test("stateful streaming agg under 10% per-task chaos == batch twin") {
    import spark.implicits._
    def run(name: String): Map[(java.sql.Timestamp, String), (Long, Long)] = {
      val stream = graft.streaming.Streams.windowedAgg(
        graft.streaming.Streams.eventsStream(spark, sfDir))
      val q = stream.writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name)
        .select($"hour", $"event_type", $"n_events", $"sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap
    }
    Chaos.rate = 0.0
    val clean = run("chaos_stream_clean")
    val before = Chaos.injected.get()
    Chaos.rate = 0.1
    val chaotic =
      try run("chaos_stream_dirty")
      finally Chaos.rate = 0.0
    val injected = Chaos.injected.get() - before
    assert(clean.nonEmpty)
    assert(chaotic == clean,
      "stateful streaming under 10% task chaos must match the clean run")
    // batch twin: the stream's answer is right, not merely stable
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap
    assert(chaotic == batch)
    // the faults must be real — a zero count would make the
    // equalities vacuous (micro-batches run tens of tasks at 10%)
    assert(injected >= 1,
      s"expected injected micro-batch task failures, got $injected")
  }
}
