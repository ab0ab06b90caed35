package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Hashing / signature primitives for the dedup + similarity suite.
  *
  * Everything is seeded and driver-side deterministic: the same seeds
  * produce the same signatures on every run and every cluster size,
  * which is what makes the [rows-only] operators reproducible.
  *
  * Where the per-row logic is a tight loop over an array (simhash,
  * winnowing, hyperplane projection) we use a Scala UDF on primitive
  * arrays — measured faster than a 64-way higher-order-function
  * expansion, and still fully distributed (map-side, no shuffle).
  * MinHash signatures, by contrast, stay pure `functions._`
  * compositions (codegen'd, whole-stage).
  */
object Hashes {

  /** Murmur3 fmix64 finalizer. FNV-1a alone is NOT a uniform bit
    * source: its low bit is byte parity, and its top byte is barely
    * touched by a string's final characters (each ×prime round lifts
    * low-bit entropy by ~40 positions — the last bytes never reach
    * the top), so BIT-FIELD extractions over templated inputs
    * (sequential user ids, "img:id:c" fixtures) collapse — measured:
    * 150 sequential user ids landing in 4 of 256 HLL buckets. Every
    * sketch that slices bit ranges out of a hash must finalize with
    * this (full-hash EQUALITY joins don't need it). Replayed exactly
    * in DuckDB via split 32-bit multiplies mod 2⁶⁴. */
  def mix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33)
    h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33)
    h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }

  /** FNV-1a 64-bit — tiny, dependency-free, stable across JVMs. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Seeded per-permutation salts for MinHash. */
  def minhashParams(numPerms: Int, seed: Long = 42L): Seq[Long] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPerms)(rng.nextLong())
  }

  /** LSH band keys from a signature: hash of each r-slice. Explode the
    * result and group on (band index, key) — only ~B rows per doc ever
    * shuffle, never the O(n²) pair space. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), array_join(transform(
        slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string")), "_"))
    }: _*)

  /** 64-bit SimHash over a token multiset. */
  val simhash64: UserDefinedFunction = udf { (tokens: Seq[String]) =>
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** Seeded random hyperplanes (H x dim), components in [-1, 1). */
  def hyperplanes(h: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(h, dim)(rng.nextDouble() * 2 - 1)
  }

  /** Sign-projection signature of an embedding onto the planes:
    * bit i = (embedding · plane_i) > 0. */
  def hyperplaneSig(planes: Array[Array[Double]]): UserDefinedFunction =
    udf { (emb: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var dot = 0.0
        var i = 0
        while (i < plane.length && i < emb.length) { dot += emb(i) * plane(i); i += 1 }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

  /** Multi-word sign-projection signature (the words ≥ 2 tier of the
    * hyperplane schedule, r11 what's-missing #2): word w packs
    * planes [64w, 64w+64), so GLOBAL plane p lands at word p/64 bit
    * p%64 — the same global-bit indexing the one-word
    * [[hyperplaneSig]] uses and the oracle's `(p-1)//bandBits`
    * replay assumes. One-word signatures stay on [[hyperplaneSig]]
    * (hash-stable BIGINT form). */
  def hyperplaneSigWords(planes: Array[Array[Double]]): UserDefinedFunction =
    udf { (emb: Seq[Float]) =>
      val words = new Array[Long]((planes.length + 63) / 64)
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var dot = 0.0
        var i = 0
        while (i < plane.length && i < emb.length) { dot += emb(i) * plane(i); i += 1 }
        if (dot > 0) words(p / 64) |= (1L << (p % 64))
        p += 1
      }
      words
    }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): hash all
    * k-gram character shingles, slide a window of w hashes, keep the
    * rightmost minimum per window; dedupe positions. Returns the
    * selected hashes (sorted, distinct). */
  def winnow(k: Int, w: Int): UserDefinedFunction = udf { (text: String) =>
    val n = text.length - k + 1
    if (n <= 0) Array.empty[Long]
    else {
      val hashes = Array.tabulate(n)(i => fnv64(text.substring(i, i + k)))
      val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
      if (n <= w) {
        var best = 0
        for (i <- 1 until n) if (hashes(i) <= hashes(best)) best = i
        picked += best
      } else {
        for (start <- 0 to n - w) {
          var best = start
          for (i <- start + 1 until start + w)
            if (hashes(i) <= hashes(best)) best = i
          picked += best
        }
      }
      picked.toArray.map(hashes).distinct.sorted
    }
  }
}
