package graft.operators

import graft.SparkTestBase
import graft.functions.Hashes

/** Oracles for the hashed linear quality classifier beyond the DuckDB
  * gate: a hand-computed single-document score (the full hash → bucket
  * → weight → mean path replicated in plain Scala), score-range
  * sanity, and determinism. */
class ModelSpec extends SparkTestBase {

  private def localScore(text: String): (Long, Double) = {
    val tk = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val feats = tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val ws = feats.map { f =>
      val b = Hashes.fnv64(f) & (ModelOps.Buckets - 1).toLong
      val m = (b * ModelOps.KnuthC) % 4294967296L
      m.toDouble / 2147483648.0 - 1.0
    }
    (feats.length.toLong, ws.sum / feats.length)
  }

  test("text_hash_lr: matches a hand-computed replica on real docs") {
    import spark.implicits._
    val got = ModelOps.textHashLr(spark, sfDir).collect()
    val texts = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    got.take(25).foreach { r =>
      val (n, s) = localScore(texts(r.getLong(0)))
      assert(r.getLong(1) == n, s"n_feats mismatch for doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - s) < 1e-6,
        s"score mismatch for doc ${r.getLong(0)}: ${r.getDouble(2)} vs $s")
      assert(r.getBoolean(3) == (r.getDouble(2) > 0))
    }
  }

  test("text_hash_lr: scores bounded in [-1, 1) and deterministic") {
    val a = ModelOps.textHashLr(spark, sfDir).collect()
    val b = ModelOps.textHashLr(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    a.foreach(r => assert(r.getDouble(2) >= -1.0 && r.getDouble(2) < 1.0))
  }

  test("text_perceptron_train: integer training replica, learning reduces errors") {
    import spark.implicits._
    val B = ModelOps.PercBuckets
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val feats = docs.map { case (id, t) =>
      val buckets = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(tok => (Hashes.fnv64(tok) & (B - 1)).toInt).distinct
      (id, if (id % 10 == 9) 1L else -1L, buckets)
    }
    val w = Array.fill(B)(0L)
    var lastErrors = feats.length + 1
    for (r <- 1 to ModelOps.PercRounds) {
      val mis = feats.filter { case (_, y, bs) => y * bs.map(w(_)).sum <= 0 }
      if (r == 1) assert(mis.length == feats.length, "cold start must misclassify all")
      lastErrors = mis.length
      mis.foreach { case (_, y, bs) => bs.foreach(b => w(b) += y) }
    }
    val expected = feats.map { case (id, y, bs) =>
      val m = bs.map(w(_)).sum
      (id, y, m, y * m > 0)
    }.toSet
    val got = ModelOps.textPerceptronTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSet == expected, "trained margins diverged from the integer replica")
    // training moved the model: the final pass classifies most docs
    val nCorrect = got.count(_._4)
    assert(nCorrect > feats.length / 2,
      s"learning had no effect: $nCorrect/${feats.length} correct")
  }

  test("q_model_gains: deciles conserve counts, capture is monotone to 1.0") {
    val rows = ModelOps.qModelGains(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "deciles must be 1..10")
    val scored = ModelOps.textPerceptronTrain(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == scored.length, "decile sizes must cover every scored doc")
    assert(rows.map(_.getLong(2)).sum == scored.count(_.getLong(1) == 1L),
      "decile positives must sum to the class total")
    // cumulative capture is nondecreasing and ends at exactly 1
    val caps = rows.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a }, "capture must be monotone")
    assert(caps.last == 1.0, s"final capture ${caps.last}")
    // balanced deciles: sizes differ by at most 1 (explicit ceil cut)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: ${sizes.toSeq}")
  }
}
