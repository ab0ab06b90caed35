package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The containment join's degenerate-mass bound (r7): the per-key
  * dual-anchor cap must be INERT on organic corpora (df ≤ cap
  * everywhere at gate scale, so the brute-force DuckDB oracle stays
  * exact) and LINEAR on a duplicate mass (the stress decade measured
  * the uncapped prefix × full-posting join at 58× for 10× data). */
class ContainmentCapSpec extends SparkTestBase {

  test("gate-scale corpora never hit the cap: every shingle df <= cap") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val maxDf = DedupOps.shingled(docs)
      .select(explode($"sh").as("key"))
      .groupBy($"key").agg(count(lit(1)).as("df"))
      .agg(max($"df")).as[Long].head()
    assert(maxDf <= Blocking.DefaultCap,
      s"max shingle df $maxDf exceeds the cap at gate scale — the " +
        "brute-force containment oracle would no longer witness the cap as inert")
  }

  test("organic corpus: capped containment == brute force, pair for pair") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val sh = DedupOps.shingled(docs).cache()
    val got = DedupOps.containmentPairs(sh, 0.6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    val brute = a.crossJoin(b)
      .where($"doc_a" =!= $"doc_b" &&
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size($"sh_a").cast("double") >= 0.6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"capped join diverged from brute force: missing ${brute -- got}, extra ${got -- brute}")
    assert(brute.nonEmpty, "vacuous: no containment pairs at gate scale")
  }

  test("content-grain expansion == direct capped join on the organic corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val sh = DedupOps.shingled(docs).cache()
    val direct = DedupOps.containmentPairs(sh, 0.6)
      .select($"doc_a", $"doc_b", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    val byContent = DedupOps.containmentPairsByContent(sh, 0.6)
      .select($"doc_a", $"doc_b", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(byContent == direct,
      s"content-grain diverged: missing ${direct -- byContent}, extra ${byContent -- direct}")
  }

  test("content-grain: verbatim copies expand with exact containment 1.0") {
    import spark.implicits._
    // 3 distinct contents, each with 3 verbatim copies; contents built
    // so content A is contained in content B (C(a->b) = 1) but not
    // vice versa — expansion must carry the rep containment to every
    // member pair AND emit all within-group ordered pairs at 1.0
    val a = "alpha beta gamma delta epsilon zeta"
    val b = a + " eta theta iota kappa lambda mu nu xi"
    val c = "omicron pi rho sigma tau upsilon phi chi"
    val docs = Seq(
      (1L, a), (2L, a), (3L, a),
      (11L, b), (12L, b), (13L, b),
      (21L, c), (22L, c), (23L, c)).toDF("doc_id", "text")
    val got = DedupOps.containmentPairsByContent(DedupOps.shingled(docs), 0.6)
      .as[(Long, Long, Double)].collect().toSet
    val aIds = Set(1L, 2L, 3L); val bIds = Set(11L, 12L, 13L); val cIds = Set(21L, 22L, 23L)
    val within = (aIds ++ bIds ++ cIds).flatMap { x =>
      val grp = if (aIds(x)) aIds else if (bIds(x)) bIds else cIds
      (grp - x).map(y => (x, y, 1.0))
    }
    val crossAB = for { x <- aIds; y <- bIds } yield (x, y, 1.0)
    assert(got == within ++ crossAB,
      s"expected a-in-b cross pairs + within groups at 1.0; diff: " +
        s"missing ${(within ++ crossAB) -- got}, extra ${got -- (within ++ crossAB)}")
  }

  test("content-grain: an identical mass stays linear and anchor-connected") {
    import spark.implicits._
    val n = 2000
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = spark.range(1, n + 1)
      .select($"id".as("doc_id"), lit(text).as("text"))
    val pairs = DedupOps.containmentPairsByContent(DedupOps.shingled(docs), 0.6)
      .select($"doc_a", $"doc_b")
    val cnt = pairs.count()
    val cap = Blocking.DefaultCap
    assert(cnt <= 2L * n * cap, s"$cnt pairs from an $n-identical mass — not linear")
    assert(cnt >= n.toLong, "mass fragmented")
    val touched = pairs
      .where($"doc_a" <= cap || $"doc_b" <= cap)
      .select(explode(array($"doc_a", $"doc_b")).as("d"))
      .select(countDistinct($"d")).as[Long].head()
    assert(touched == n.toLong, s"only $touched/$n docs reach an anchor")
  }

  test("duplicate mass: candidates linear in n, every doc anchor-connected") {
    import spark.implicits._
    val n = 2000
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = spark.range(1, n + 1)
      .select($"id".as("doc_id"), lit(text).as("text"))
    val sh = DedupOps.shingled(docs)
    val pairs = DedupOps.containmentPairs(sh, 0.6)
      .select($"doc_a", $"doc_b")
    val cnt = pairs.count()
    val cap = Blocking.DefaultCap
    // dual-anchor admission: ≤ 2·n·cap directed pairs, NOT n²
    assert(cnt <= 2L * n * cap,
      s"$cnt pairs from an $n-identical-doc mass — cap not binding (n² would be ${n.toLong * (n - 1)})")
    assert(cnt >= n.toLong, "mass no longer connected: fewer pairs than docs")
    // every doc appears in at least one admitted pair with an anchor
    // (doc_id ≤ cap), so a CC pass recovers the cluster intact
    val touched = pairs
      .where($"doc_a" <= cap || $"doc_b" <= cap)
      .select(explode(array($"doc_a", $"doc_b")).as("d"))
      .select(countDistinct($"d")).as[Long].head()
    assert(touched == n.toLong,
      s"only $touched/$n docs reach an anchor — duplicate mass fragmented")
  }
}
