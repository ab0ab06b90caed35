package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The session-scoped suffix memos key on a (name, size, mtime)
  * corpus fingerprint — a corpus regenerated IN PLACE must never be
  * served stale frames (the r2 incremental-index lesson, re-proven
  * for the r5 memos). */
class SuffixMemoSpec extends SparkTestBase {

  test("suffix memo invalidates when the corpus file changes in place") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    val run = (1 to 10).map(i => s"r$i").mkString(" ")

    def writeDocs(docs: Seq[(Long, String)]): Unit = {
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // distinct mtime second-granularity not guaranteed — nudge it
      val f = new java.io.File(s"$dir/documents.parquet")
      f.setLastModified(f.lastModified() + 2000)
    }

    // corpus 1: docs 1 and 2 share a 10-token run
    writeDocs(Seq((1L, s"a0 $run"), (2L, s"b0 $run"), (3L, "c1 c2 c3")))
    val first = SuffixOps.qDedupExactSubstr(spark, dir)
      .select($"doc_id", $"covered").as[(Long, Long)].collect().toMap
    assert(first.keySet == Set(1L, 2L) && first.values.forall(_ == 10L), s"$first")

    // same session, same path, DIFFERENT corpus: doc 3 now carries
    // the duplicate; a stale memo would still report docs 1 and 2
    writeDocs(Seq((1L, "a1 a2 a3"), (3L, s"c0 $run"), (4L, s"d0 $run")))
    val second = SuffixOps.qDedupExactSubstr(spark, dir)
      .select($"doc_id", $"covered").as[(Long, Long)].collect().toMap
    assert(second.keySet == Set(3L, 4L) && second.values.forall(_ == 10L),
      s"stale memo served after in-place corpus regeneration: $second")
  }
}
