package graft.mr

import org.apache.spark.sql.SparkSession
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
  * user code runs. Non-vacuity is the ChaosSpec discipline (r12 —
  * the r11-style constant floor flaked here too once the suite ran
  * twice: a 4-partition micro-batch can draw zero hash injections):
  * the chaotic run executes in a fresh 16-partition session so the
  * stateful stages carry real task breadth, and the floor derives
  * from the MEASURED first-attempt count, which [[Chaos.topUp]]
  * makes safe by construction. */
class ChaosStreamingSpec extends SparkTestBase {

  private def freshSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "16")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s
  }

  test("stateful streaming agg under 10% per-task chaos == batch twin") {
    def run(s: SparkSession,
        name: String): Map[(java.sql.Timestamp, String), (Long, Long)] = {
      import s.implicits._
      val stream = graft.streaming.Streams.windowedAgg(
        graft.streaming.Streams.eventsStream(s, sfDir))
      val q = stream.writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select($"hour", $"event_type", $"n_events", $"sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap
    }
    Chaos.rate = 0.0
    val clean = run(freshSession(), "chaos_stream_clean")
    val i0 = Chaos.injected.get()
    val t0 = Chaos.firstAttempts.get()
    Chaos.rate = 0.1
    val chaotic =
      try run(freshSession(), "chaos_stream_dirty")
      finally Chaos.rate = 0.0
    val injected = Chaos.injected.get() - i0
    val tasks = Chaos.firstAttempts.get() - t0
    assert(clean.nonEmpty)
    assert(chaotic == clean,
      "stateful streaming under 10% task chaos must match the clean run")
    // batch twin: the stream's answer is right, not merely stable
    import spark.implicits._
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap
    assert(chaotic == batch)
    // the faults must be REAL and proportional to what ran: the
    // starvation top-up guarantees injected >= floor(tasks/20) at
    // 10%, so tasks/25 can never flake on hash luck or suite order
    info(s"streaming chaos: $injected injected over $tasks first-attempt tasks")
    assert(tasks >= 20,
      s"chaotic micro-batches launched only $tasks fresh tasks — vacuous")
    assert(injected >= math.max(1L, tasks / 25),
      s"expected injected micro-batch task failures, got $injected over $tasks")
  }
}
