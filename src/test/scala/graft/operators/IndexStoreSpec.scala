package graft.operators

import graft.SparkTestBase

/** Contract of the persisted build-index store (r10 verdict #1: the
  * five `build_*` session memos — suffix LCPs, contamination spans,
  * NSW edges, jaccard CC chain, BPE merges — persist to the index
  * root keyed by (corpus fingerprint, dial) so a rerun in a NEW JVM
  * pays a parquet read, not the multi-job cold construction; r11
  * verdict #1: retention must never delete a root this JVM has
  * served frames from, and concurrent same-key builders commit via
  * unique attempt dirs + a last-written pointer, no renames). */
class IndexStoreSpec extends SparkTestBase {

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-idxstore").toString
    graft.mr.Fs.overrideIndexRoot = Some(d)
    d
  }

  /** Simulate roots built by OTHER JVMs: this JVM's live-root pin is
    * what the eviction-race fix is about, so retention tests must
    * drop the pin to make roots deletable at all. Selective by index
    * name — clearing pins other suites hold (the suffix gate roots)
    * would reintroduce the very race this file regression-tests. */
  private def unpin(name: String): Unit =
    IndexStore.liveRoots.removeIf(_.contains(name))

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

  test("a changed key (corpus or dial) rebuilds; COLD roots retained up to cap") {
    val rootDir = freshRoot()
    try {
      var builds = 0
      def load(key: String) = IndexStore.frames(spark, "spec_b", key,
        Seq("d")) { builds += 1; Seq(spark.range(4).toDF("x")) }
      (1 to IndexStore.Retain + 2).foreach { i =>
        load(s"fp$i") // regenerated corpus / re-dialed geometry
        unpin("spec_b") // cold: as if built by an earlier, finished JVM
        Thread.sleep(20) // distinct mtimes for the retention order
      }
      assert(builds == IndexStore.Retain + 2, "every new key must rebuild")
      // retention: the store self-cleans past Retain COLD roots per
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

  test("a root without a committed pointer (killed mid-write) is rebuilt") {
    val rootDir = freshRoot()
    try {
      var builds = 0
      def load() = IndexStore.frames(spark, "spec_c", "k",
        Seq("d")) { builds += 1; Seq(spark.range(2).toDF("x")) }
      load()
      assert(builds == 1)
      // simulate a watchdog kill between the attempt write and the
      // pointer put: no _PTR -> the attempt never committed
      new java.io.File(rootDir).listFiles()
        .filter(_.getName.contains("spec_c"))
        .foreach(r => new java.io.File(r, "_PTR").delete())
      val rows = load().head.count()
      assert(builds == 2, "missing pointer must force a rebuild")
      assert(rows == 2)
      // and a pointer naming an attempt whose _READY is gone (partial
      // delete, bit-rot) is treated as absent, not served
      new java.io.File(rootDir).listFiles()
        .filter(_.getName.contains("spec_c"))
        .flatMap(_.listFiles()).filter(_.isDirectory)
        .foreach(a => new java.io.File(a, "_READY").delete())
      assert(load().head.count() == 2)
      assert(builds == 3, "pointer to an unready attempt must rebuild")
    } finally graft.mr.Fs.overrideIndexRoot = None
  }

  test("retention never deletes a root this JVM serves frames from " +
      "(r11 eviction race): >Retain corpora churn, held frame still reads") {
    val rootDir = freshRoot()
    try {
      def load(key: String) = IndexStore.frame(spark, "spec_live", key)(
        spark.range(7).toDF("v"))
      // a long-lived session loads the gate corpus's index and memos
      // the LAZY parquet-backed frame (exactly SuffixOps.lcpMemo)
      val held = load("gate-corpus")
      assert(held.count() == 7)
      // ... then the suite cycles many fixture corpora through the
      // SAME index name; each new root is immediately cold (unpin
      // simulates other-JVM builders), but "gate-corpus" stays pinned
      // because THIS JVM served frames from it
      val heldRoots = new java.io.File(rootDir).listFiles()
        .filter(_.getName.contains("spec_live")).map(_.getName).toSet
      (1 to IndexStore.Retain + 4).foreach { i =>
        load(s"fixture$i")
        // unpin the fixture root just loaded (other-JVM builder); the
        // held root's pin — the fix under test — stays
        IndexStore.liveRoots.removeIf(n =>
          n.contains("spec_live") && !heldRoots.contains(n))
        Thread.sleep(5)
      }
      // the held root survived the churn and its frame still reads —
      // the exact FILE_NOT_EXIST failure mode of the r11 full suite
      assert(held.count() == 7,
        "retention deleted a root with live readers in this JVM")
      // and retention still bounds the COLD roots
      val n = new java.io.File(rootDir).listFiles()
        .count(_.getName.contains("spec_live"))
      assert(n <= IndexStore.Retain + 1,
        s"cold-root retention stopped working under the live exemption: $n")
    } finally graft.mr.Fs.overrideIndexRoot = None
  }
}
