package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based oracles for the two novel algorithmic pieces of the
  * dedup stack — a single fixture can't explore the input space that
  * breaks them (odd graph shapes for the star contraction, prefix/
  * length boundary cases for the lossless filter), so both are checked
  * against driver-side brute force over many seeded random inputs
  * (explicit seeds: reproducible without the scalatest-scalacheck
  * bridge, which isn't in the offline cache). */
class DedupPropertySpec extends SparkTestBase {

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed)).get

  // ---- connected components vs driver-side union-find ----

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are component minima because unions always point the
    // larger root at the smaller
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private val graphGen: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(2, 40)
    nEdges <- Gen.choose(0, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield (n, edges.filter(e => e._1 != e._2))

  test("connectedComponents == union-find on 12 seeded random graphs") {
    import spark.implicits._
    (1L to 12L).foreach { seed =>
      val (n, edges) = sample(graphGen, seed)
      val universe = (0L until n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toDF("doc_a", "doc_b")
      val got = DedupOps.connectedComponents(pairs, universe)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = unionFind(n, edges)
      assert(got == expected, s"seed=$seed n=$n edges=$edges")
    }
  }

  // ---- lossless prefix-filtered Jaccard vs brute force ----

  private val corpusGen: Gen[List[String]] = {
    // small vocabulary forces overlap; doc lengths straddle the
    // shingle threshold and the tau-boundary sizes
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for {
      nDocs <- Gen.choose(2, 12)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 12)
        ws <- Gen.listOfN(len, word)
      } yield ws.mkString(" "))
    } yield docs
  }

  private def bruteJaccard(docs: Seq[String], tau: Double): Set[(Long, Long)] = {
    val sets = docs.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(DedupOps.ShingleSize).filter(_.length == DedupOps.ShingleSize)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      if j >= tau
    } yield (a, b)).toSet
  }

  test("jaccardPairs == brute-force all-pairs on 12 seeded random corpora") {
    import spark.implicits._
    (100L to 111L).foreach { seed =>
      val docs = sample(corpusGen, seed)
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = DedupOps
        .jaccardPairs(DedupOps.shingled(df), tau = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = bruteJaccard(docs, 0.5)
      assert(got == expected,
        s"seed=$seed docs=$docs missing=${expected.diff(got)} extra=${got.diff(expected)}")
    }
  }

  // ---- lossless asymmetric containment filter vs brute force ----

  private def bruteContainment(docs: Seq[String], tau: Double): Set[(Long, Long)] = {
    val sets = docs.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .sliding(DedupOps.ShingleSize).filter(_.length == DedupOps.ShingleSize)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = sa.intersect(sb).size.toDouble / sa.size.toDouble
      if c >= tau
    } yield (a, b)).toSet
  }

  test("containmentPairs == brute-force all-ordered-pairs on 12 seeded random corpora") {
    import spark.implicits._
    (200L to 211L).foreach { seed =>
      val docs = sample(corpusGen, seed)
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = DedupOps
        .containmentPairs(DedupOps.shingled(df), tau = 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = bruteContainment(docs, 0.6)
      assert(got == expected,
        s"seed=$seed docs=$docs missing=${expected.diff(got)} extra=${got.diff(expected)}")
    }
  }
}
