package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.functions.VectorExpressions.cosine_sim

class VectorExprSpec extends SparkTestBase {

  test("CosineSim == composable HOF cosine, bit for bit (float arrays)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val pairs = emb.select($"vec_id".as("a_id"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("b_id"), $"embedding".as("b")))
      .where($"a_id" < $"b_id").limit(5000)
    val diff = pairs
      .select(cosine_sim($"a", $"b").as("fast"), Cols.cosine($"a", $"b").as("hof"))
      .where($"fast" =!= $"hof")
      .count()
    assert(diff == 0, "fused expression must be bit-identical to the HOF form")
  }

  test("CosineSim interpreted eval == codegen eval") {
    import spark.implicits._
    // force the interpreted path through a literal-free projection on
    // a tiny frame, then compare against driver-side math
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.5f, -0.5f, 2.0f), Array(1.5f, 0.25f, -1.0f))).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).collect().map(_.getDouble(0))
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- x.indices) {
        val xi = x(i).toDouble; val yi = y(i).toDouble
        d += xi * yi; na += xi * xi; nb += yi * yi
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = Seq(
      ref(Array(1f, 2f, 3f), Array(3f, 2f, 1f)),
      ref(Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      ref(Array(0.5f, -0.5f, 2f), Array(1.5f, 0.25f, -1f)))
    assert(got.toSeq == exp)
  }

  test("cosine_sim callable from SQL after registration / via extensions") {
    VectorExpressions.register(spark)
    import spark.implicits._
    Tables.embeddings(spark, sfDir).limit(10).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""".stripMargin)
      .where($"c".isNotNull && $"c".between(-1.0001, 1.0001)).count()
    assert(n == 45)
  }

  test("SimHash64Expr == UDF simhash, bit for bit, on real token arrays") {
    import spark.implicits._
    import graft.functions.Cols.normTokens
    val diff = Tables.documents(spark, sfDir)
      .select(
        VectorExpressions.simhash64_native(normTokens($"text")).as("native"),
        Hashes.simhash64(normTokens($"text")).as("viaUdf"))
      .where($"native" =!= $"viaUdf")
      .count()
    assert(diff == 0)
  }

  test("MinHashSigExpr == driver-side reference; deterministic; monotone under union") {
    import spark.implicits._
    val salts = Hashes.minhashParams(16)
    val rng = new scala.util.Random(9)
    val rows = Seq.fill(50)(Array.fill(rng.nextInt(40) + 1)(rng.nextLong()))
    val df = rows.toDF("sh")
    val got = df.select(VectorExpressions.minhash_sig($"sh", salts).as("sig"))
      .collect().map(_.getSeq[Long](0))
    def ref(sh: Array[Long]): Seq[Long] =
      salts.map(s => sh.map(v => MinHashSigExpr.mix(v ^ s)).min)
    rows.zip(got).foreach { case (sh, sig) =>
      assert(sig == ref(sh), "expression must equal driver-side reference")
    }
    // minhash property: sig of A ∪ B = elementwise min of sigs
    val a = rows(0); val b = rows(1)
    val u = (a ++ b).distinct
    assert(ref(u) == ref(a).zip(ref(b)).map(t => math.min(t._1, t._2)))
  }

  test("FnvShinglesExpr == fnv64 of the space-joined n-gram, on real token arrays") {
    import spark.implicits._
    import graft.functions.Cols.normTokens
    val docs = Tables.documents(spark, sfDir)
      .select(normTokens($"text").as("tk"))
      .where(size($"tk") >= 3)
    val got = docs
      .select($"tk", VectorExpressions.fnv_shingles($"tk", 3).as("sh"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val tk = r.getSeq[String](0)
      val sh = r.getSeq[Long](1)
      val exp = tk.sliding(3).map(g => Hashes.fnv64(g.mkString(" "))).toSeq
      assert(sh == exp, "fused shingle hash must equal fnv64(join(gram, ' '))")
    }
    // fewer tokens than n → empty, not null
    val short = Seq(Seq("a", "b")).toDF("tk")
      .select(VectorExpressions.fnv_shingles($"tk", 3).as("sh")).head()
    assert(short.getSeq[Long](0).isEmpty)
  }

  test("GraftExtensions session: SQL functions + TopKPerKey strategy, no experimental touch") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val ext = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        import ext.implicits._
        // SQL functions resolve without imperative registration
        val row = ext.sql(
          """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
            |       simhash64(array('a', 'b')) AS s,
            |       fnv_shingles(array('a', 'b', 'c', 'd'), 3) AS f""".stripMargin).head()
        assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
        assert(row.getLong(1) == {
          val acc = Seq("a", "b").map(Hashes.fnv64)
          var sig = 0L
          for (b <- 0 until 64) {
            val v = acc.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
            if (v > 0) sig |= 1L << b
          }
          sig
        })
        assert(row.getSeq[Long](2) ==
          Seq(Hashes.fnv64("a b c"), Hashes.fnv64("b c d")))
        // the injected strategy plans TopKPerKeyPlan — experimental
        // strategies stay empty
        assert(ext.experimental.extraStrategies.isEmpty)
        val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("k", "v")
        val analyzed = df.queryExecution.analyzed
        val attr = (n: String) => analyzed.output.find(_.name == n).get
        val plan = graft.plans.TopKPerKeyPlan(
          Seq(attr("k")),
          Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
            attr("v"), org.apache.spark.sql.catalyst.expressions.Descending)),
          2, analyzed)
        val top = org.apache.spark.sql.graft.ColumnBridge.ofRows(ext, plan)
        assert(top.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
          Set(("a", 3L), ("a", 2L), ("b", 9L)))
        assert(ext.experimental.extraStrategies.isEmpty, "strategy came from extensions")
      } finally {
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
      }
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }

  test("null/mismatched input handling") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f)))).toDF("a", "b")
    val out = df.select(cosine_sim($"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0), "null input → null output")
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("SortedOverlapCount == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { _ =>
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong).distinct.sorted
      (a, b)
    } :+ ((Array.empty[Long], Array(1L, 2L))) :+ ((Array(3L), Array(3L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect($"a", $"b")).cast("long").as("want"),
      graft.functions.VectorExpressions.sorted_overlap($"a", $"b").as("got"))
    assert(got.where($"want" =!= $"got").count() == 0,
      "merge kernel disagrees with array_intersect")
    // interpreted eval path matches too
    val inData = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1L, 4L, 9L))
    val other = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(2L, 4L, 8L, 9L))
    assert(graft.functions.SortedOverlapCount.count(inData, other) == 2L)
  }

  test("sorted_overlap callable from SQL via extensions") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      try {
        val r = s.sql("SELECT sorted_overlap(array(1L,2L,5L), array(2L,3L,5L))")
          .head().getLong(0)
        assert(r == 2L)
      } finally {
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
      }
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }
}
