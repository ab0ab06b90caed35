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
}
