package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened like Bench: each query runs in its own job group with a
  * watchdog (SPARK_GRAFT_QUERY_TIMEOUT, default 120 s) so one
  * pathological query can't eat the driver's wall clock and zero the
  * whole round's correctness artifact; oracle_sql.json is written
  * FIRST so a mid-run kill still leaves the oracle set on disk. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query subset]
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val queryTimeoutMs =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "120").toLong * 1000L
    val spark = SparkSession.builder()
      // unreliable mode (GRAFT_CHAOS=0.1 — the reference's chaos
      // harness, mapreduce.go:465): injected first-attempt task
      // failures need task retries, which local-mode defaults to 1
      .master(if (graft.mr.Chaos.rate > 0) s"local[$cpus, 4]" else s"local[$cpus]")
      .config("spark.plugins", "graft.mr.ChaosPlugin")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r11 advice (medium): the oracle strings interpolate the STATIC
    // geometry accessors; publish the gate corpus so they resolve
    // through the same n-aware schedule the engine serve paths use —
    // oracle and engine can then never desync on a corpus past the
    // schedule thresholds
    graft.operators.GeometryContext.set(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Provenance sidecar (r7 verdict #7) — a SEPARATE file: the
    // driver iterates oracle_sql.json keys as queries, so provenance
    // must not ride inside it. check.py cross-checks these counts so
    // a stale or subset dump is machine-detected.
    val gitSha = try {
      val p = Runtime.getRuntime.exec(Array("git", "rev-parse", "HEAD"))
      val sha = new String(p.getInputStream.readAllBytes()).trim
      p.waitFor()
      if (sha.matches("[0-9a-f]{40}")) sha else "unknown"
    } catch { case _: Throwable => "unknown" }
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"git_sha":"$gitSha","registry_count":${SparkEntry.queries.size},""" +
        s""""oracle_count":${SparkEntry.oracleSql.size},""" +
        s""""geometry":${q(graft.operators.GeometryContext.describe())},""" +
        s""""subset":${only.nonEmpty}}""")

    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      spark.sparkContext.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
      val watchdog = new java.util.Timer(true)
      watchdog.schedule(new java.util.TimerTask {
        def run(): Unit = spark.sparkContext.cancelJobGroup(s"verify-$name")
      }, queryTimeoutMs)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        watchdog.cancel()
        spark.sparkContext.clearJobGroup()
      }
    }
    spark.stop()
  }
}
