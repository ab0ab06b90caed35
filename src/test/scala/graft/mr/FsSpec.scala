package graft.mr

import graft.SparkTestBase

class FsSpec extends SparkTestBase {

  test("Fs primitives resolve explicit file:// URIs via the Hadoop FileSystem API") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fs").toString
    val uri = "file://" + dir

    assert(!Fs.exists(uri + "/_READY"))
    Fs.touch(uri + "/_READY")
    assert(Fs.exists(uri + "/_READY"))
    assert(Fs.len(uri + "/_READY") == 0L)
    assert(Fs.len(uri + "/absent") == 0L)

    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.bin"), Array[Byte](1, 2, 3))
    assert(Fs.len(uri + "/data.bin") == 3L)

    // directory fingerprint lists children name-sorted with sizes
    val fp = Fs.fingerprint(uri)
    assert(fp.contains("_READY:0:") && fp.contains("data.bin:3:"), fp)
    // single-file fingerprint
    assert(Fs.fingerprint(uri + "/data.bin").startsWith("data.bin:3:"))
  }
}
