package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.functions.Cols.normTokens

class ContamSpec extends SparkTestBase {

  test("within-train duplicates are NOT contamination; cross-set spans are exact") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      // two IDENTICAL train docs — dedup's business, not decontamination's
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      // a train doc whose middle 12 tokens leak into the benchmark
      (3L, s"x1 x2 $run y1 y2 y3"),
      (19L, s"z1 $run z2"), // benchmark (id % 10 == 9)
      (29L, "b1 b2 b3 b4 b5 b6 b7 b8")) // unrelated benchmark
      .toDF("doc_id", "text")

    val out = SuffixOps.contamSpans(docs)
      .select($"doc_id", $"n_spans", $"contaminated", $"max_contam_len")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    assert(!out.contains(1L) && !out.contains(2L),
      s"train-internal duplicates leaked into contamination: $out")
    assert(out == Map(3L -> ((1L, 12L, 12L))),
      s"expected exactly doc 3 with one 12-token span, got $out")
  }

  test("covered tokens == tokens inside an L-gram shared with the bench split (sf corpus)") {
    // independent identity: a train token lies in a cross-duplicated
    // substring of length ≥ L iff it lies in an exact L-gram that
    // also occurs in the benchmark split — computed here with a
    // plain gram join, no suffix machinery
    import spark.implicits._
    val L = SuffixOps.ContamMinLen
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", normTokens($"text").as("tk"))
      .select($"doc_id", size($"tk").cast("long").as("len"),
        posexplode($"tk").as(Seq("p", "tok")))
      .select($"doc_id", $"p".cast("long").as("pos"), $"len", $"tok")
    // L-grams as joined strings per start position
    val grams = Tables.documents(spark, sfDir)
      .select($"doc_id", normTokens($"text").as("tk"))
      .where(size($"tk") >= L)
      .select($"doc_id", size($"tk").cast("long").as("len"),
        posexplode(PipelineOps.wordNgrams($"tk", L)).as(Seq("st", "g")))
    val benchG = grams.where($"doc_id" % 10 === 9).select($"g").distinct()
    val expected = grams.where($"doc_id" % 10 =!= 9)
      .join(benchG, "g")
      .select($"doc_id", explode(sequence($"st", $"st" + L - 1)).as("t"))
      .distinct()
      .groupBy($"doc_id").agg(count(lit(1)).as("covered"))
      .as[(Long, Long)].collect().toMap

    val got = SuffixOps.contamSpans(Tables.documents(spark, sfDir))
      .select($"doc_id", $"contaminated").as[(Long, Long)].collect().toMap

    assert(got.nonEmpty, "no contamination found on the sf corpus")
    assert(got == expected,
      s"mismatch: only-exact=${(got.toSet diff expected.toSet).take(3)} " +
        s"only-gram=${(expected.toSet diff got.toSet).take(3)}")
  }

  test("cut corpus is clean: no L-gram of any cleaned doc appears in the bench split") {
    // the whole point of the cutting pass — after removal, the
    // training corpus shares no ≥L-token run with the benchmark.
    // (Cut seams can in principle mint a new matching gram; this
    // corpus is deterministic, so a pass here is a stable guarantee.)
    import spark.implicits._
    val L = SuffixOps.ContamMinLen
    val cleaned = SuffixOps.qCutContaminated(spark, sfDir)
      .select($"doc_id", normTokens($"cleaned").as("tk"))
    val cleanGrams = cleaned.where(size($"tk") >= L)
      .select($"doc_id", explode(PipelineOps.wordNgrams($"tk", L)).as("g"))
    val benchGrams = Tables.documents(spark, sfDir)
      .where($"doc_id" % 10 === 9)
      .select(normTokens($"text").as("tk"))
      .where(size($"tk") >= L)
      .select(explode(PipelineOps.wordNgrams($"tk", L)).as("g"))
      .distinct()
    val leaks = cleanGrams.join(benchGrams, "g").count()
    assert(leaks == 0L, s"$leaks bench-shared $L-grams survived the cut")

    // removal accounting matches the span report
    val removed = SuffixOps.qCutContaminated(spark, sfDir)
      .select($"doc_id", $"n_removed").as[(Long, Long)].collect().toMap
      .filter(_._2 > 0)
    val reported = SuffixOps.qDecontaminateSpans(spark, sfDir)
      .select($"doc_id", $"contaminated").as[(Long, Long)].collect().toMap
    assert(removed == reported,
      s"cut accounting != span report: ${(removed.toSet diff reported.toSet).take(3)}")
  }
}
