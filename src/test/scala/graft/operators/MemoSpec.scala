package graft.operators

import graft.SparkTestBase

/** [[Memo]]/[[Memos]] hygiene: bounded size with eldest eviction,
  * session identity that never migrates across sessions (the
  * identityHashCode-reuse hazard the r5 ADVICE flagged), and
  * recompute-on-evict rather than stale service. */
class MemoSpec extends SparkTestBase {

  test("memo evicts eldest past the cap and recomputes it on return") {
    val m = new Memo[String](cap = 3)
    var builds = 0
    def get(k: String): String =
      m.getOrElseUpdate(spark, k, { builds += 1; s"v$k" })
    (1 to 3).foreach(i => get(s"c$i"))
    assert(builds == 3)
    get("c1"); assert(builds == 3, "hit must not rebuild")
    get("c4"); assert(builds == 4) // evicts eldest (c1: LinkedHashMap insertion order)
    get("c1"); assert(builds == 5, "evicted entry must rebuild, not serve stale")
    get("c3"); get("c4")
    assert(builds == 5, "recent entries still cached")
  }

  test("session ids are stable within a session and distinct across sessions") {
    val a = Memos.sessionId(spark)
    assert(a == Memos.sessionId(spark), "unstable within a session")
    val other = spark.newSession()
    assert(Memos.sessionId(other) != a, "distinct sessions share an identity")
    assert(a.startsWith(spark.sparkContext.applicationId),
      "application scope missing from the key")
  }

  test("different corpus keys never cross-serve") {
    val m = new Memo[Int]()
    assert(m.getOrElseUpdate(spark, "fpA", 1) == 1)
    assert(m.getOrElseUpdate(spark, "fpB", 2) == 2)
    assert(m.getOrElseUpdate(spark, "fpA", 99) == 1)
  }
}
