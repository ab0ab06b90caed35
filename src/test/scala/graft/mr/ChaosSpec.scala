package graft.mr

import org.apache.spark.sql.SparkSession

import graft.SparkTestBase

/** Chaos parity with the reference's `unreliable` mode
  * (/root/reference/mapreduce.go:465-510: the test harness drops or
  * garbles 10-20% of worker RPCs and the engine must still converge
  * to the correct result). The Spark analogue of a dropped RPC is a
  * failed task attempt, and the r3 spec proved exactly ONE injected
  * failure retries; this family injects ~10% RANDOM per-task
  * failures — first attempts only, deterministically chosen by a
  * mix64 of (stageId, partitionId) — across EVERY stage of three
  * structurally different jobs, and asserts each converges to the
  * bit-identical failure-free result:
  *
  *   1. a chained two-stage MapReduce engine job (map + combine +
  *      reduce stages of BOTH jobs are all injectable);
  *   2. a banded dedup query (sig → band-key shuffle → pair join →
  *      verify — the multi-shuffle LSH shape);
  *   3. an iterative graph query (pagerank: a scan + ~5 rounds of
  *      join/agg stages, each its own injectable stage set).
  *
  * Injection rides [[Chaos]]/[[ChaosPlugin]] — `ExecutorPlugin
  * .onTaskStart` runs at the head of EVERY task of EVERY stage, so
  * unlike a flaky Mapper the fault surface covers Catalyst interior
  * stages (shuffle reads, aggregates) where no user code runs. The
  * test master `local[4, 2]` allows exactly one retry, so a second-
  * attempt failure would fail the job — the spec therefore also
  * proves injected faults never cascade past one retry.
  *
  * Non-vacuity (r11 verdict #2): every run executes in a FRESH
  * session, so session memos from earlier suites cannot serve the
  * chaotic run from warm localCheckpoint blocks with near-zero fresh
  * tasks (the r11 full-suite failure: a constant injection floor
  * tripped because the "chaotic" runs barely launched tasks). The
  * floor is now derived from the MEASURED first-attempt task count
  * of each chaotic run — [[Chaos.firstAttempts]] is counted in the
  * same hook that injects — so the assertion scales with what
  * actually ran and holds under ANY suite order. */
class ChaosSpec extends SparkTestBase {

  /** Fresh session with 16 shuffle partitions: the shared test
    * session's 4 would make these sf0.001 jobs a handful of tasks —
    * too few for a meaningful injection count. 16 keeps every stage
    * multi-task so the measured floor has teeth. */
  private def freshSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "16")
    // AQE would coalesce these sf0.001 shuffles back to 1 task per
    // stage; the chaos proof wants breadth (many injectable tasks),
    // not tight packing
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s
  }

  /** Run `body` twice — clean, then under `rate` chaos — each in a
    * FRESH session (memo keys include the session UUID, so both runs
    * rebuild from the corpus; no plan/memo cache can serve either).
    * Returns (clean, chaotic, injectedCount, firstAttemptTasks). */
  private def cleanVsChaos(rate: Double)(
      body: SparkSession => Array[String]): (Array[String], Array[String], Long, Long) = {
    Chaos.rate = 0.0
    val clean = body(freshSession())
    val i0 = Chaos.injected.get()
    val t0 = Chaos.firstAttempts.get()
    // the chaotic run must REBUILD: a fresh session defeats the
    // session memos (keys include the session UUID), and clearing
    // the context-wide cache manager defeats Tables' .cache() —
    // otherwise the "chaotic" run replays warm blocks with almost no
    // fresh tasks and every convergence assertion is vacuous (the
    // r11 full-suite failure). Other suites re-cache lazily.
    spark.catalog.clearCache()
    Chaos.rate = rate
    try {
      val chaotic = body(freshSession())
      (clean, chaotic,
        Chaos.injected.get() - i0, Chaos.firstAttempts.get() - t0)
    } finally Chaos.rate = 0.0
  }

  /** Per-run non-vacuity: injections must be REAL and proportional
    * to the run's measured size. [[Chaos.topUp]] guarantees
    * injected ≥ ⌊tasks·rate/2⌋ by construction, so tasks/25 at 10%
    * can never flake on hash luck or suite order; the tasks floor
    * proves the fresh session really rebuilt instead of replaying
    * warm memo/cache blocks (the r11 vacuity failure: 4-29 tasks; fresh runs measure 50-300). */
  private def assertNonVacuous(
      name: String, injected: Long, tasks: Long): Unit = {
    info(s"$name: $injected injected over $tasks first-attempt tasks")
    assert(tasks >= 40,
      s"$name: chaotic run launched only $tasks fresh first-attempt tasks " +
        "— a warm cache served it and the convergence check is vacuous")
    assert(injected >= math.max(1L, tasks / 25),
      s"$name: $injected injections over $tasks first attempts at 10% " +
        "— the plugin is not firing at the dialed rate")
  }

  test("chained MR engine job: 10% per-task chaos, identical result") {
    def run(s: SparkSession): Array[String] = {
      import s.implicits._
      val input = graft.Tables.documents(s, sfDir)
        .select($"doc_id".cast("string"), $"text").as[(String, String)]
        .repartition(16) // multi-task map stages (the corpus is 1 file)
      val counts = MapReduceJob.run(input,
        new WordCount.WordCountMapper, new WordCount.SumReducer,
        Some(WordCount.SumCombiner))
      val freqMapper = new Mapper[String, Long, Long, Long] {
        def map(k: String, v: Long, e: Emitter[Long, Long]): Unit = e.emit(v, 1L)
      }
      val sumReducer = new Reducer[Long, Long, Long] {
        def reduce(k: Long, vs: Iterator[Long]): Long = vs.sum
      }
      MapReduceJob.run(counts, freqMapper, sumReducer,
          Some(new Combiner[Long] {
            def combine(a: Long, b: Long): Long = a + b
          }))
        .collect().map(_.toString).sorted
    }
    val (clean, chaotic, injected, tasks) = cleanVsChaos(0.1)(run)
    assert(clean.nonEmpty)
    assert(chaotic.sameElements(clean),
      "chained MR under 10% task chaos must match the failure-free run")
    assertNonVacuous("chained MR", injected, tasks)
  }

  test("banded dedup query: 10% per-task chaos, identical result") {
    def run(s: SparkSession): Array[String] =
      graft.operators.DedupOps.dedupMinhashLsh(s, sfDir)
        .collect().map(_.toString).sorted
    val (clean, chaotic, injected, tasks) = cleanVsChaos(0.1)(run)
    assert(clean.nonEmpty)
    assert(chaotic.sameElements(clean),
      "banded dedup under 10% task chaos must match the failure-free run")
    assertNonVacuous("banded dedup", injected, tasks)
  }

  test("iterative graph query: 10% per-task chaos, identical result") {
    def run(s: SparkSession): Array[String] =
      graft.operators.GraphOps.qPagerank(s, sfDir)
        .collect().map(_.toString).sorted
    val (clean, chaotic, injected, tasks) = cleanVsChaos(0.1)(run)
    assert(clean.nonEmpty)
    assert(chaotic.sameElements(clean),
      "iterative pagerank under 10% task chaos must match the failure-free run")
    assertNonVacuous("iterative pagerank", injected, tasks)
  }

  test("chaos decision is deterministic and ~rate-proportional") {
    val hits = (0 until 200).flatMap { st =>
      (0 until 4).map(p => Chaos.decide(0.1, st, p, attempt = 0))
    }
    val rate = hits.count(identity).toDouble / hits.size
    assert(rate > 0.05 && rate < 0.15,
      s"10% dial should fail ~10% of (stage,partition) pairs, got $rate")
    // attempt 1+ never fails: one retry always lands (the spec's
    // convergence guarantee, and the reference's reassign contract)
    assert((0 until 200).forall(st => !Chaos.decide(0.1, st, 0, attempt = 1)))
    // same inputs, same answer — the injection is reproducible
    assert((0 until 50).forall(st =>
      Chaos.decide(0.1, st, 1, 0) == Chaos.decide(0.1, st, 1, 0)))
  }
}
