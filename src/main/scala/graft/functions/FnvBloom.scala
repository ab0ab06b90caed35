package graft.functions

/** A Bloom filter whose every bit is SQL-replayable — the upgrade
  * that moves the decontamination gate's sketch from spec-bounded to
  * hash-verified. Spark's `DataFrame.stat.bloomFilter` is built on
  * Murmur3_x86_32 over serialized bytes, which no oracle can
  * reasonably replay; this one composes the two primitives the
  * DuckDB oracles already replay bit-exactly (FNV-1a 64 and the
  * fmix64 finalizer, SparkEntry.fnvSql/mixSql) with the standard
  * Kirsch–Mitzenmacher double-hashing scheme:
  *
  *   h1 = mix64(fnv64(s)), h2 = mix64(h1),
  *   probe_i = (h1 + i·h2) mod 2⁶⁴ masked to the table size,
  *   i ∈ [0, k).
  *
  * `numBits` is a power of two so the mask IS the mod and the
  * signed-Long wrap matches the oracle's HUGEINT mod-2⁶⁴ arithmetic.
  * Same guarantees as any Bloom: ZERO false negatives (adds set all
  * k bits; contains requires all k), false positives bounded by the
  * load factor — and deterministic, so the gate hashes the exact
  * flag set, false positives included.
  *
  * Merge is bitwise OR, which is what makes the distributed build a
  * `treeAggregate`: partitions fold their grams locally, filters OR
  * pairwise — the same mergeable-sketch shape as the KMV/HLL pair.
  */
final class FnvBloom(val numBits: Int, val k: Int) extends Serializable {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    "numBits must be a power of two (the mask is the mod)")
  require(k >= 1 && k <= 16, "k out of range")
  private val words = new Array[Long](numBits >>> 6)
  private val mask = (numBits - 1).toLong

  private def probe(h1: Long, h2: Long, i: Int): Int =
    ((h1 + i.toLong * h2) & mask).toInt

  def add(s: String): Unit = {
    val h1 = Hashes.mix64(Hashes.fnv64(s))
    val h2 = Hashes.mix64(h1)
    var i = 0
    while (i < k) {
      val b = probe(h1, h2, i)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  def mightContain(s: String): Boolean = {
    val h1 = Hashes.mix64(Hashes.fnv64(s))
    val h2 = Hashes.mix64(h1)
    var i = 0
    while (i < k) {
      val b = probe(h1, h2, i)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge (the treeAggregate combiner). */
  def merge(o: FnvBloom): FnvBloom = {
    require(o.numBits == numBits && o.k == k, "geometry mismatch")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    this
  }

  def setBitCount: Long = words.map(java.lang.Long.bitCount(_).toLong).sum
}

object FnvBloom {
  /** Distributed build: per-partition local filters OR'd up a tree —
    * the driver never sees a gram, only ⌈log⌉ filter merges. */
  def build(ds: org.apache.spark.sql.Dataset[String],
      numBits: Int, k: Int): FnvBloom =
    ds.rdd.treeAggregate(new FnvBloom(numBits, k))(
      (bf, s) => { bf.add(s); bf },
      (a, b) => a.merge(b))
}
