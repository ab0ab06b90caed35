package graft.mr

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, SparkPlugin}

/** Unreliable-mode parity with the reference's chaos harness
  * (/root/reference/mapreduce.go:465-510: `unreliable` drops or
  * garbles 10-20% of worker RPCs mid-job and the engine must still
  * converge to the correct result). Spark's analogue of a dropped
  * RPC is a failed task ATTEMPT, so graft's unreliable mode injects
  * deterministic first-attempt task failures at a configured rate —
  * across EVERY stage of every job, including Catalyst interior
  * stages (shuffle reads, aggregates) that carry no user code —
  * through [[ChaosPlugin]], an `ExecutorPlugin.onTaskStart` hook
  * registered on each engine-built session.
  *
  * Dial: `GRAFT_CHAOS=0.1` at launch (or [[Chaos.rate]] in-process,
  * the spec path) fails ~10% of (stage, partition) first attempts.
  * The decision is a pure function of (stage, partition) — mix64 of
  * the pair against the rate — so a chaotic run is REPRODUCIBLE and
  * never fails the same task twice: the retry always lands, exactly
  * the reference's reassign-and-converge contract. Default rate 0 =
  * one branch per task start, no other cost. */
object Chaos {
  @volatile var rate: Double =
    sys.env.get("GRAFT_CHAOS").map(_.toDouble).getOrElse(0.0)

  /** Total injected failures (spec-asserted: chaos must be REAL —
    * a zero count makes every convergence assertion vacuous). */
  val injected = new AtomicLong(0)

  /** Fail this attempt? Deterministic in (stageId, partitionId);
    * never true past attempt 0, so one retry always converges. */
  def decide(rate: Double, stageId: Int, partitionId: Int, attempt: Int): Boolean =
    rate > 0 && attempt == 0 && {
      val h = graft.functions.Hashes.mix64(
        (stageId.toLong << 32) | (partitionId.toLong & 0xFFFFFFFFL))
      (h & Long.MaxValue) % 10000 < (rate * 10000).toLong
    }
}

/** The injection hook: `onTaskStart` runs at the head of every task
  * of every stage; a throw here is a task failure the scheduler
  * retries like any worker fault (ChaosSpec proves the convergence
  * on a chained MR job, a banded dedup, and an iterative graph
  * query). Registered via `spark.plugins` on the engine's sessions;
  * inert (rate 0) unless dialed. */
class ChaosPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = null
  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def onTaskStart(): Unit = {
      val tc = TaskContext.get()
      if (tc != null &&
          Chaos.decide(Chaos.rate, tc.stageId(), tc.partitionId(),
            tc.attemptNumber())) {
        Chaos.injected.incrementAndGet()
        throw new RuntimeException(
          s"graft chaos: injected failure, stage ${tc.stageId()} " +
          s"partition ${tc.partitionId()} attempt 0")
      }
    }
  }
}
