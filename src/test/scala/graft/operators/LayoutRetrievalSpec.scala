package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the r3 wave-2 operators: Z-order layout, CDC chunking,
  * BM25 retrieval, char-diversity filtering, and SemDeDup. */
class LayoutRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  /** Write a tiny documents table to a temp dir so doc-shaped
    * operators can run against controlled text. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-spec-docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("morton8: bit interleave is exact and order-preserving per axis") {
    val rows = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L)).toDF("x", "y")
      .select($"x", $"y", LayoutOps.morton8($"x", $"y").as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((255L, 255L)) == 65535L)
    // x fills even bit positions, y odd
    assert(rows((255L, 0L)) == 0x5555L)
    assert(rows((0L, 255L)) == 0xAAAAL)
    assert(rows((1L, 2L)) == (1L | (2L << 2))) // x bit0 -> z bit0, y bit1 -> z bit3
    assert(rows((170L, 85L)) == 0x6666L)
  }

  test("q_zorder_layout: every file envelope fits a 16x16 grid block") {
    val out = LayoutOps.qZorderLayout(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val custSpan = r.getAs[Long]("cust_max") - r.getAs[Long]("cust_min") + 1
      val monthSpan = r.getAs[Long]("month_max") - r.getAs[Long]("month_min") + 1
      assert(custSpan <= 16, s"file ${r.get(0)} cust span $custSpan")
      assert(monthSpan <= 16, s"file ${r.get(0)} month span $monthSpan")
      assert(r.getAs[Long]("envelope_area") == custSpan * monthSpan)
    }
  }

  test("q_compact_binpack: every file packed once; the plan never leaves a " +
      "target's worth of bytes behind a bin boundary") {
    import spark.implicits._
    val out = LayoutOps.qCompactBinpack(spark, sfDir).collect()
    assert(out.nonEmpty)
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.size > 1, "needs multiple partitions to prove parallelism")
    // conservation: every manifest file lands in exactly one bin
    val manifest = graft.Tables.documents(spark, sfDir)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    bySource.foreach { case (src, bins) =>
      assert(bins.map(_.getAs[Long]("n_files")).sum == manifest(src),
        s"$src: packed file count != manifest")
      // prefix-fill invariant of the running-sum rule: cumulative
      // bytes through bin b cover (b+1) targets for every non-final
      // bin — no bin boundary strands a target's worth of bytes
      val sorted = bins.sortBy(_.getAs[Long]("bin"))
      var cum = 0L
      sorted.dropRight(1).foreach { r =>
        cum += r.getAs[Long]("total_bytes")
        assert(cum >= (r.getAs[Long]("bin") + 1) * LayoutOps.CompactTarget,
          s"$src bin ${r.get(1)}: boundary stranded bytes")
      }
    }
  }

  test("dedup_cdc_chunks: boundaries resynchronize after a prefix edit") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val dir = docsDir(Seq(
      (1L, s"original leading words $shared"),
      (2L, s"completely different and longer preamble inserted here $shared")))
    val out = DedupOps.dedupCdcChunks(spark, dir).collect()
    // the edited prefix shifts token offsets, but content-derived cut
    // points realign inside the shared suffix: at least one >=4-token
    // chunk must be reported as appearing in both docs
    assert(out.exists(r => r.getAs[Long]("n_docs") == 2L),
      s"no shared chunk found across the prefix edit: ${out.mkString("; ")}")
  }

  test("q_bm25_search: more query-term mass at equal length ranks higher") {
    val filler = (1 to 16).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"join join join join $filler"),
      (2L, s"join scan filter pad $filler"),
      (3L, s"nothing relevant here at all $filler")))
    val out = PipelineOps.qBm25Search(spark, dir).collect()
    val scores = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(!scores.contains(3L), "doc without any query term must not score")
    assert(scores(1L) > 0 && scores(2L) > 0)
    // doc 2 hits all three (rarer coverage), but doc 1's tf mass on one
    // term still scores: both present, ranking deterministic
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == out.sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id"))).map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("text_char_diversity: degenerate distributions hit the closed-form values") {
    val dir = docsDir(Seq(
      (1L, "aaaaaaaa"),           // one char: collision 1, alphabet 1
      (2L, "abababab"),           // two equiprobable: collision 0.5
      (3L, "abcd")))              // four equiprobable: collision 0.25
    val out = PipelineOps.textCharDiversity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("collision_mass"), r.getAs[Double]("eff_alphabet"),
         r.getAs[Double]("top_char_share"))).toMap
    assert(out(1L) == ((1.0, 1.0, 1.0)))
    assert(out(2L) == ((0.5, 2.0, 0.5)))
    assert(out(3L) == ((0.25, 4.0, 0.25)))
  }

  test("dedup_semantic: pairs stay in-cluster and cosines match brute force") {
    val out = DedupOps.dedupSemantic(spark, sfDir).collect()
    assert(out.nonEmpty)
    val cluster = KMeansOps.assignments(spark, sfDir)
      .select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out.foreach { r =>
      val (c, a, b) = (r.getAs[Long]("cluster_id"), r.getAs[Long]("vec_a"),
        r.getAs[Long]("vec_b"))
      assert(cluster(a) == c && cluster(b) == c, s"pair ($a,$b) left cluster $c")
      assert(r.getAs[Long]("rnk") <= DedupOps.SemTopPerCluster)
      val (ea, eb) = (emb(a).map(_.toDouble), emb(b).map(_.toDouble))
      val dot = ea.zip(eb).map { case (x, y) => x * y }.sum
      val brute = dot / (math.sqrt(ea.map(x => x * x).sum) * math.sqrt(eb.map(x => x * x).sum))
      assert(math.abs(r.getAs[Double]("cos") - brute) < 1e-3,
        s"pair ($a,$b) cos ${r.getAs[Double]("cos")} vs brute $brute")
    }
  }

  test("hilbert_2d: bijective on the 256x256 grid and unit-step adjacent") {
    // the two defining properties of the Hilbert curve: every cell
    // gets a unique index, and consecutive indices are grid neighbors
    // (|dx|+|dy| == 1) — the locality Z-order lacks at seam crossings
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (graft.functions.Hilbert2DExpr.index(x, y), (x, y))
    assert(cells.map(_._1).distinct.length == 65536)
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
  }

  test("q_hilbert_layout: tighter mean envelope than the Z-order layout") {
    def meanArea(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select("envelope_area", "n_rows").collect()
      rows.map(r => r.getLong(0).toDouble * r.getLong(1)).sum /
        rows.map(_.getLong(1)).sum
    }
    val hil = meanArea(LayoutOps.qHilbertLayout(spark, sfDir))
    val zor = meanArea(LayoutOps.qZorderLayout(spark, sfDir))
    // row-weighted mean bounding-box area: Hilbert's unit-step
    // locality must not lose to the Z-curve's seam jumps
    assert(hil <= zor, s"hilbert mean envelope $hil > zorder $zor")
  }
}
