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

  test("memoized builders are stable under concurrent first-touch (one session)") {
    // r5 narrowed session-global shuffle conf inside the suffix and
    // NSW builders — racy if two queries share a session. The widths
    // are now passed explicitly, so two builders running CONCURRENTLY
    // on one session must produce exactly the serial results.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val pool = scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(3))
    try {
      val fa = Future(SuffixOps.qDedupExactSubstr(spark, sfDir).collect().toSeq)(pool)
      val fb = Future(HnswOps.annHnswTopk(spark, sfDir).collect().toSeq)(pool)
      // a third thread races the SAME builder the first is building —
      // the memo must serialize the build, not run it twice or serve
      // a half-built frame
      val fc = Future(SuffixOps.qDedupExactSubstr(spark, sfDir).collect().toSeq)(pool)
      val (a, b, c) =
        (Await.result(fa, 5.minutes), Await.result(fb, 5.minutes),
          Await.result(fc, 5.minutes))
      assert(a == c, "racing consumers of one builder diverged")
      assert(a == SuffixOps.qDedupExactSubstr(spark, sfDir).collect().toSeq,
        "concurrent suffix build differs from the serial serve")
      assert(b == HnswOps.annHnswTopk(spark, sfDir).collect().toSeq,
        "concurrent NSW serve differs from the serial serve")
    } finally pool.shutdown()
  }
}
