package graft.operators

import graft.SparkTestBase

/** Contract of the persisted build-index store (r10 verdict #1: the
  * five `build_*` session memos — suffix LCPs, contamination spans,
  * NSW edges, jaccard CC chain, BPE merges — persist to the index
  * root keyed by (corpus fingerprint, dial) so a rerun in a NEW JVM
  * pays a parquet read, not the multi-job cold construction). */
class IndexStoreSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-idxstore").toString
    graft.mr.Fs.overrideIndexRoot = Some(d)
    d
  }

  test("second load serves from disk without re-running the build") {
    freshRoot()
    try {
      var builds = 0
      def load() = IndexStore.frames(spark, "spec_a", "corpusX:dial1",
        Seq("one", "two")) {
        builds += 1
        Seq(spark.range(5).toDF("a"), spark.range(3).toDF("b"))
      }
      val first = load()
      assert(builds == 1)
      val again = load()
      assert(builds == 1, "second call must read the persisted parquet")
      assert(again.head.collect().map(_.getLong(0)).sorted
        .sameElements(first.head.collect().map(_.getLong(0)).sorted))
      assert(again(1).count() == 3)
    } finally graft.mr.Fs.overrideIndexRoot = None
  }

  test("a changed key (corpus or dial) rebuilds; old roots retained up to cap") {
    val rootDir = freshRoot()
    try {
      var builds = 0
      def load(key: String) = IndexStore.frames(spark, "spec_b", key,
        Seq("d")) { builds += 1; Seq(spark.range(4).toDF("x")) }
      (1 to IndexStore.Retain + 2).foreach { i =>
        load(s"fp$i") // regenerated corpus / re-dialed geometry
        Thread.sleep(20) // distinct mtimes for the retention order
      }
      assert(builds == IndexStore.Retain + 2, "every new key must rebuild")
      // retention: the store self-cleans past Retain live roots per
      // index name, so /tmp (or the production index bucket) is
      // bounded by index count x Retain, not by round count
      def roots() = new java.io.File(rootDir).listFiles()
        .filter(f => f.getName.startsWith("graft-bidx-") &&
          f.getName.contains("spec_b"))
      assert(roots().length == IndexStore.Retain,
        s"retain cap, got ${roots().map(_.getName).toSeq}")
      // the newest key is among the survivors: a reload costs no build
      load(s"fp${IndexStore.Retain + 2}")
      assert(builds == IndexStore.Retain + 2)
    } finally graft.mr.Fs.overrideIndexRoot = None
  }

  test("a root without _READY (killed mid-write) is rebuilt, not read") {
    val rootDir = freshRoot()
    try {
      var builds = 0
      def load() = IndexStore.frames(spark, "spec_c", "k",
        Seq("d")) { builds += 1; Seq(spark.range(2).toDF("x")) }
      load()
      assert(builds == 1)
      // simulate a watchdog kill between the data write and the marker
      new java.io.File(rootDir).listFiles()
        .filter(_.getName.contains("spec_c"))
        .foreach(r => new java.io.File(r, "_READY").delete())
      val rows = load().head.count()
      assert(builds == 2, "missing marker must force a rebuild")
      assert(rows == 2)
    } finally graft.mr.Fs.overrideIndexRoot = None
  }
}
