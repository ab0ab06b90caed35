package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round helper: dump `.explain("formatted")` for named
  * queries to `<outDir>/<name>_<tag>.txt` — the before/after plan
  * evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> q1,q2,...
  * Session config mirrors Bench (same master/shuffle width/AQE) so
  * the captured plans are the ones the bench actually serves.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, qs) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.GeometryContext.set(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    qs.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      System.err.println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
