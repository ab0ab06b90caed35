package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SURVEY §2.H: partitioned writes + partition pruning on read. */
class SourcesSpec extends SparkTestBase {

  test("partitionBy write → partition-pruned read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString + "/docs"
    Tables.documents(spark, sfDir)
      .write.partitionBy("lang").parquet(dir)

    // directory layout is hive-style
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(langDirs.count(_.startsWith("lang=")) >= 4)

    val back = spark.read.parquet(dir)
    assert(back.count() == Tables.documents(spark, sfDir).count())

    // a lang filter must prune partitions, not scan-and-filter
    val pruned = back.where($"lang" === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in scan:\n${scan.take(800)}")
    assert(pruned.count() ==
      Tables.documents(spark, sfDir).where($"lang" === "en").count())
  }

  test("csv and json round-trip a full table with schema") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).orderBy($"doc_id")
    for (fmt <- Seq("csv", "json")) {
      val dir = Files.createTempDirectory(s"graft-rt-$fmt").toString + "/t"
      docs.write.format(fmt).option("header", "true").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true").schema(docs.schema).load(dir)
      assert(back.count() == docs.count())
      val a = docs.select($"doc_id", $"lang").as[(Long, String)].collect().toMap
      val b = back.select($"doc_id", $"lang").as[(Long, String)].collect().toMap
      assert(a == b)
    }
  }
}
