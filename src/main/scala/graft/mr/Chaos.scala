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

  /** First-attempt task starts observed WHILE chaos was dialed on —
    * counted in the same `onTaskStart` hook that decides injection,
    * so `injected / firstAttempts` is exactly the realized injection
    * rate and the spec's non-vacuity floor can be derived from the
    * MEASURED task count (r11 verdict #2: a constant floor went
    * vacuous when warm memos let a chaotic run launch almost no
    * fresh tasks — the floor must scale with what actually ran). */
  val firstAttempts = new AtomicLong(0)

  /** Fail this attempt? The hash draw is deterministic in (stageId,
    * partitionId) — but the REALIZED injection set is only
    * deterministic modulo [[topUp]] (r12 advice): the starvation
    * top-up rides a JVM-wide counter, so which extra tasks it fails
    * depends on run order and concurrency. What IS invariant: never
    * true past attempt 0 (one retry always converges — topUp
    * included), and `injected ≥ ⌊firstAttempts·rate/2⌋` holds by
    * construction whatever the interleaving. */
  def decide(rate: Double, stageId: Int, partitionId: Int, attempt: Int): Boolean =
    rate > 0 && attempt == 0 && {
      val h = graft.functions.Hashes.mix64(
        (stageId.toLong << 32) | (partitionId.toLong & 0xFFFFFFFFL))
      (h & Long.MaxValue) % 10000 < (rate * 10000).toLong
    }

  private val sinceInjection = new AtomicLong(0)

  /** Starvation guard (r11 verdict #2): the mix64 draw is uniform,
    * but stage ids depend on what ran before, so a SMALL chaotic run
    * can draw zero injections and leave the convergence assertions
    * vacuous without failing loudly. While chaos is dialed, at most
    * every ⌈2/rate⌉ consecutive first-attempt task starts pass
    * without an injection — the next one is failed regardless of the
    * hash — so `injected ≥ ⌊firstAttempts·rate/2⌋` holds by
    * CONSTRUCTION and the spec's measured floor can never flake on
    * hash luck or suite order. First attempts only, like [[decide]]:
    * a retry always lands. */
  def topUp(rate: Double, attempt: Int): Boolean =
    rate > 0 && attempt == 0 &&
      sinceInjection.incrementAndGet() >= math.ceil(2.0 / rate).toLong && {
        sinceInjection.set(0); true
      }

  private[mr] def noteInjection(): Unit = sinceInjection.set(0)
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
      if (tc != null && Chaos.rate > 0 && tc.attemptNumber() == 0)
        Chaos.firstAttempts.incrementAndGet()
      if (tc != null &&
          (Chaos.decide(Chaos.rate, tc.stageId(), tc.partitionId(),
            tc.attemptNumber()) ||
           Chaos.topUp(Chaos.rate, tc.attemptNumber()))) {
        Chaos.noteInjection()
        Chaos.injected.incrementAndGet()
        throw new RuntimeException(
          s"graft chaos: injected failure, stage ${tc.stageId()} " +
          s"partition ${tc.partitionId()} attempt 0")
      }
    }
  }
}
