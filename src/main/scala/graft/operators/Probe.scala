package graft.operators

import graft.Tables

import org.apache.spark.sql.SparkSession

/** Throwaway optimization-round probe: stage-level timing of the
  * expensive index builds (no UI in this sandbox, so sub-step wall
  * times stand in for the stage page). Not part of any gate. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()

    // --- build_nsw_graph decomposition (mirrors HnswOps.edges) ---
    val geo = AnnOps.lshGeometryFor(spark, dir)
    System.err.println(s"[probe] geometry $geo")
    val sig = AnnOps.sigUdfFor(geo._1)
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    t("warmup emb.count")(System.err.println(s"[probe] n_vectors ${emb.count()}"))
    def bandKeys(c: org.apache.spark.sql.Column) =
      array(AnnOps.bandKeyCols(c, geo): _*)
    // driver-side microbenchmark of the raw signature fold
    locally {
      val planes = graft.functions.Hashes.hyperplanes(geo._1, 64)
      val sample: Seq[Float] = Array.fill(64)(0.5f).toSeq
      def sigOf(emb: Seq[Float]): Long = {
        var sg = 0L; var p = 0
        while (p < planes.length) {
          val plane = planes(p); var dot = 0.0; var i = 0
          while (i < plane.length && i < emb.length) { dot += emb(i) * plane(i); i += 1 }
          if (dot > 0) sg |= (1L << p); p += 1
        }
        sg
      }
      t("raw sig x 2000 (driver)")((0 until 2000).foreach(_ => sigOf(sample)))
    }
    val sigMat = emb.select($"vec_id", sig($"embedding").as("s"))
    val bandedMat = sigMat.select($"vec_id", explode(bandKeys($"s")).as("key"))
    t("banded MATERIALIZED sig noop")(noop(bandedMat))
    val banded = emb.select($"vec_id", explode(bandKeys(sig($"embedding"))).as("key"))
    t("banded count 1")(System.err.println("[probe]   rows " + banded.count()))
    t("banded count 2")(banded.count())
    val sigOnly = emb.select($"vec_id", sig($"embedding").as("s"))
    t("sig only noop")(noop(sigOnly))
    t("banded noop")(noop(banded))
    val und = Blocking.cappedPairs(banded, "vec_id", "a", "b", 256)
    t("cappedPairs+distinct")(System.err.println("[probe]   pairs " + und.count()))
    val und2 = und.localCheckpoint(true)
    val scored = und2
      .join(emb.select($"vec_id".as("a"), $"embedding".as("ea")), "a")
      .join(emb.select($"vec_id".as("b"), $"embedding".as("eb")), "b")
      .select($"a", $"b",
        graft.functions.Cols.rnd(
          graft.functions.VectorExpressions.cosine_sim($"ea", $"eb"), 6).as("sim_r"))
    t("score (2 joins + cosine)")(noop(scored))
    val sc2 = t("score + checkpoint")(scored.localCheckpoint(true))
    val cands = sc2.select($"a".as("src"), $"b".as("dst"), $"sim_r")
      .unionByName(sc2.select($"b".as("src"), $"a".as("dst"), $"sim_r"))
    val kept = graft.plans.TopK.perKey(cands,
      keyCols = Seq("src"), orderCols = Seq("sim_r" -> false, "dst" -> true), k = 12)
      .select($"src", $"dst")
    t("mirror+topk+distinct")(noop(
      kept.unionByName(kept.select($"dst".as("src"), $"src".as("dst"))).distinct()))
    spark.stop()
  }
}
