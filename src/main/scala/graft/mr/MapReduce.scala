package graft.mr

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's programming model (Mapper/Reducer/Emitter,
  * /root/reference/mapper.go:13, reducer.go:13, emitter.go:17),
  * compiled to Spark Datasets.
  *
  * What the reference implements by hand — input chunking (M tasks),
  * hash-partitioned intermediate storage (hash(key) mod R,
  * emittedStore.go), task assignment, retry, completion tracking
  * (taskManager.go, mapreduce.go) — maps 1:1 onto Spark's input
  * splits, shuffle, and DAG scheduler, so the engine here is only the
  * semantic core: flatMap → (optional map-side combine) → grouped
  * reduce.
  *
  * Scale note: always supply a [[Combiner]] when the reduction is
  * associative — that path compiles to `reduceGroups`, whose physical
  * plan does partial aggregation before the shuffle (the difference
  * between shuffling one pair per (mapper, word) and one pair per
  * word occurrence at 100 TB). The combiner-less path streams each
  * key's values through the reducer exactly once, like the
  * reference's ReduceTask.execute (tasks.go:139).
  */
trait Emitter[K2, V2] {
  def emit(key: K2, value: V2): Unit
}

trait Mapper[K1, V1, K2, V2] extends Serializable {
  def map(key: K1, value: V1, emitter: Emitter[K2, V2]): Unit
}

trait Reducer[K2, V2, Out] extends Serializable {
  def reduce(key: K2, values: Iterator[V2]): Out
}

/** Associative merge of intermediate values — enables map-side
  * partial aggregation (the reference has no equivalent; its demo
  * reducer re-sums everything reducer-side, reducer.go:36). */
trait Combiner[V2] extends Serializable {
  def combine(a: V2, b: V2): V2
}

/** Full-field parity with the reference's JobConfig (jobConfig.go:6).
  * `m` (map task count) is advisory only — Spark derives input splits
  * from the source; `r` (reduce partitions) controls the partitioning
  * of the result, like the reference's one-output-object-per-reduce-
  * partition. 0 = let Spark/AQE decide. The input/output fields
  * resolve to Inputers/Outputers exactly like the reference wires
  * them: a prechunked `inputFolder` reads one value per stored chunk
  * object; a monolithic `inputFile` is split into ~`m` line-boundary
  * chunks on the fly (the reference calls SplitFileIntoChunks up
  * front instead); `outputFolder` gets one object per reduced key
  * (S3Outputer parity). */
final case class JobConfig(
    m: Int = 0,
    r: Int = 0,
    inputFolder: String = "",
    outputFolder: String = "",
    prechunked: Boolean = false,
    inputFile: String = "") {

  def inputer: Inputer =
    if (!prechunked && inputFile.nonEmpty) {
      val size = math.max(1L, Fs.len(inputFile))
      val chunkBytes = if (m > 0) math.max(1L, size / m) else 1L << 20
      ChunkedTextInputer(inputFile, chunkBytes)
    } else TextDirInputer(inputFolder)

  def outputer: Outputer = KeyedDirOutputer(outputFolder)
}

object MapReduceJob {

  /** Run a map-reduce job over a keyed dataset. */
  def run[K1, V1, K2, V2, Out](
      input: Dataset[(K1, V1)],
      mapper: Mapper[K1, V1, K2, V2],
      reducer: Reducer[K2, V2, Out],
      combiner: Option[Combiner[V2]] = None,
      config: JobConfig = JobConfig())(implicit
      kEnc: Encoder[K2],
      kvEnc: Encoder[(K2, V2)],
      vEnc: Encoder[V2],
      outEnc: Encoder[(K2, Out)]): Dataset[(K2, Out)] = {

    val mapped = input.mapPartitions { it =>
      it.flatMap { case (k, v) =>
        val buf = ArrayBuffer.empty[(K2, V2)]
        mapper.map(k, v, (k2: K2, v2: V2) => { buf += ((k2, v2)); () })
        buf
      }
    }

    val grouped = mapped.groupByKey(_._1)
    val reduced = combiner match {
      case Some(c) =>
        grouped
          .mapValues(_._2)
          .reduceGroups((a: V2, b: V2) => c.combine(a, b))
          .map { case (k, v) => (k, reducer.reduce(k, Iterator.single(v))) }
      case None =>
        grouped.mapGroups { (k, it) => (k, reducer.reduce(k, it.map(_._2))) }
    }
    if (config.r > 0) reduced.repartition(config.r) else reduced
  }

  /** Secondary sort: the reducer sees each key's values in
    * `sortCols` order — the classic Hadoop composite-key pattern
    * (partition by natural key, sort by (key, value-fields), walk key
    * runs). Compiled to `repartition(key)` + `sortWithinPartitions`,
    * so ordering comes from the shuffle's sort machinery (spillable,
    * O(1) memory per group) — values are streamed to the reducer, not
    * buffered per key, exactly like Hadoop's grouping comparator.
    * `sortCols` must order by `_1` first; ties across the remaining
    * columns should be broken to a total order for determinism. */
  def runSecondarySort[K2, V2, Out](
      input: Dataset[(K2, V2)],
      reducer: Reducer[K2, V2, Out],
      sortCols: Seq[org.apache.spark.sql.Column],
      config: JobConfig = JobConfig())(implicit
      kvEnc: Encoder[(K2, V2)],
      outEnc: Encoder[(K2, Out)]): Dataset[(K2, Out)] = {
    val parts =
      if (config.r > 0) config.r
      else input.sparkSession.sessionState.conf.numShufflePartitions
    // normalize column names so sortCols can address `_1` / `_2.field`
    // regardless of what the caller's select named them
    val kv = input.toDF("_1", "_2").as[(K2, V2)]
    val sorted = kv
      .repartition(parts, kv.col("_1"))
      .sortWithinPartitions(sortCols: _*)
    sorted.mapPartitions { it =>
      val buf = it.buffered
      new scala.collection.AbstractIterator[(K2, Out)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (K2, Out) = {
          val k = buf.head._1
          val vals: Iterator[V2] = new scala.collection.AbstractIterator[V2] {
            def hasNext: Boolean = buf.hasNext && buf.head._1 == k
            def next(): V2 = buf.next()._2
          }
          val out = reducer.reduce(k, vals)
          while (vals.hasNext) vals.next() // drain any unconsumed tail
          (k, out)
        }
      }
    }
  }

  /** End-to-end parity with the reference's `Start(config, ...)`
    * (mapreduce.go): resolve the config's Inputer, run the job, write
    * one object per reduced key to the config's output folder. Keys
    * are strings end-to-end, as in the reference. */
  def start[V2, Out](
      spark: org.apache.spark.sql.SparkSession,
      config: JobConfig,
      mapper: Mapper[String, String, String, V2],
      reducer: Reducer[String, V2, Out],
      combiner: Option[Combiner[V2]] = None)(implicit
      kvEnc: Encoder[(String, V2)],
      vEnc: Encoder[V2],
      outEnc: Encoder[(String, Out)]): Unit = {
    import spark.implicits.newStringEncoder
    val out = run(config.inputer.toDataset(spark), mapper, reducer, combiner, config)
    config.outputer.write(out)
  }
}

/** The reference's demo job: word-frequency counting
  * (/root/reference/mapper.go:36, reducer.go:36), with the map-side
  * pre-count kept (the demo also counts within a chunk before
  * emitting) plus a combiner for shuffle-light scaling. */
object WordCount {

  class WordCountMapper extends Mapper[String, String, String, Long] {
    override def map(key: String, value: String, em: Emitter[String, Long]): Unit = {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      value.split("\\s+").foreach { w =>
        if (w.nonEmpty) counts.update(w, counts.getOrElse(w, 0L) + 1L)
      }
      counts.foreach { case (w, c) => em.emit(w, c) }
    }
  }

  object SumCombiner extends Combiner[Long] {
    override def combine(a: Long, b: Long): Long = a + b
  }

  class SumReducer extends Reducer[String, Long, Long] {
    override def reduce(key: String, values: Iterator[Long]): Long = values.sum
  }
}
