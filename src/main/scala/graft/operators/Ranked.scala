package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranks and running sums WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no `partitionBy` moves every row to ONE
  * partition — fine on an aggregate at sf0.1, fatal when the ranked
  * frame grows with the corpus (10⁹ users ⇒ one executor sorts the
  * world). This utility produces the exact same `row_number()` /
  * running-sum values with an all-partitions plan, via the classic
  * distributed prefix-sum decomposition:
  *
  *   1. `repartitionByRange` on the order key — the same range
  *      shuffle a global sort would do, except the rows STAY spread
  *      across all partitions (partition p holds keys ≤ partition
  *      p+1's, equal keys never straddle a boundary);
  *   2. pin the layout (`localCheckpoint`) so the sampled range
  *      boundaries cannot drift between the two reads below;
  *   3. one bounded collect of per-partition row counts / partial
  *      sums — #partitions rows of driver state, independent of data
  *      size (the qBisectMedian driver-loop discipline);
  *   4. broadcast the exclusive prefix offsets back and run the
  *      window PARTITIONED by the physical partition id: each
  *      executor ranks only its own range, then adds its offset.
  *
  * Because ranges are ordered and the intra-partition order is the
  * requested total order, `offset + local row_number` IS the global
  * `row_number` — bit-identical to the single-partition plan, so
  * oracle hashes are unchanged. The per-partition window does incur
  * one pid-keyed exchange (Catalyst cannot see that the checkpointed
  * layout already clusters by pid), but both shuffles spread over
  * all partitions — nothing in the plan is single-partition.
  */
object Ranked {

  /** Result frame plus the total row count (free from the offsets
    * collect — this replaces the `lit(df.count())` sizing action the
    * callers used to pay as a separate job). */
  final case class RankedFrame(df: DataFrame, n: Long)

  /** Adds `rankCol` = global `row_number()` over `order` and, for
    * each `(expr, name)` in `runningSums`, a column `name` = the
    * inclusive running sum of `expr` (LongType) over the same order.
    * `order` must be a total order (include a unique tiebreaker) so
    * the rank is deterministic.
    */
  def withGlobalRank(
      df: DataFrame,
      order: Seq[Column],
      rankCol: String,
      runningSums: Seq[(Column, String)] = Nil,
      numPartitions: Option[Int] = None): RankedFrame = {
    // explicit width > session conf: iterative builders (SuffixOps)
    // narrow their eager rounds WITHOUT mutating session-global conf
    // (not thread-safe under concurrent queries — r5 ADVICE)
    val np = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val parted = df
      .repartitionByRange(np, order: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(Checkpoints.cut)

    val sumAliases = runningSums.zipWithIndex.map { case ((c, _), i) =>
      sum(c.cast("long")).as(s"__s$i")
    }
    val perPart: Array[Row] = parted
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), sumAliases: _*)
      .orderBy(col("__pid"))
      .collect()

    // exclusive prefix offsets per partition id (bounded: ≤ np rows)
    var cntOff = 0L
    val sumOffs = Array.fill(runningSums.size)(0L)
    val offRows = perPart.map { r =>
      val row = Row.fromSeq(r.getInt(0).toLong +: cntOff +: sumOffs.toSeq)
      cntOff += r.getLong(1)
      var i = 0
      while (i < runningSums.size) {
        sumOffs(i) += (if (r.isNullAt(2 + i)) 0L else r.getLong(2 + i)); i += 1
      }
      row
    }
    val total = cntOff

    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid64", org.apache.spark.sql.types.LongType) +:
        org.apache.spark.sql.types.StructField("__cntOff", org.apache.spark.sql.types.LongType) +:
        runningSums.indices.map(i =>
          org.apache.spark.sql.types.StructField(s"__off$i", org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)

    val byPid = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val cum = byPid.rowsBetween(Window.unboundedPreceding, 0)
    var out = parted
      .join(broadcast(offDf), parted("__pid").cast("long") === offDf("__pid64"))
      .withColumn(rankCol, (col("__cntOff") + row_number().over(byPid)).cast("long"))
    runningSums.zipWithIndex.foreach { case ((c, name), i) =>
      out = out.withColumn(name, col(s"__off$i") + sum(c.cast("long")).over(cum))
    }
    RankedFrame(
      out.drop("__pid", "__pid64", "__cntOff").drop(runningSums.indices.map(i => s"__off$i"): _*),
      total)
  }

  /** Adds `outCol` = the running max of `value` (DoubleType) over
    * all rows STRICTLY before this one in `order` (NULL for the
    * first row) — the Pareto-frontier carry — with the same
    * range-partition + broadcast-offset decomposition as
    * [[withGlobalRank]]: per-partition maxes collect (≤ np scalars),
    * prior-partition maxes broadcast back, and the intra-partition
    * strict-prior max runs in a pid-partitioned window. */
  def withStrictPriorMax(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outCol: String): DataFrame = {
    val np = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = df
      .repartitionByRange(np, order: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(Checkpoints.cut)
    val perPart = parted
      .groupBy(col("__pid"))
      .agg(max(value.cast("double")).as("__max"))
      .orderBy(col("__pid"))
      .collect()
    var runMax: Option[Double] = None
    val offRows = perPart.map { r =>
      val row = Row(r.getInt(0).toLong, runMax.map(java.lang.Double.valueOf).orNull)
      if (!r.isNullAt(1))
        runMax = Some(runMax.fold(r.getDouble(1))(math.max(_, r.getDouble(1))))
      row
    }
    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid64", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__maxOff", org.apache.spark.sql.types.DoubleType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val strictPrior = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(broadcast(offDf), parted("__pid").cast("long") === offDf("__pid64"))
      // greatest() ignores NULLs: NULL only when neither side exists
      .withColumn(outCol,
        greatest(col("__maxOff"), max(value.cast("double")).over(strictPrior)))
      .drop("__pid", "__pid64", "__maxOff")
  }

  /** Adds `rankCol` = global `dense_rank()` over ascending `keys` in
    * ONE pass over the full frame — the suffix-construction hot path.
    *
    * The r5 shape ranked the DISTINCT key tuples with
    * [[withGlobalRank]] and equi-joined the ranks back: a distinct
    * shuffle of the positions frame, a range shuffle of the (nearly
    * positions-sized) distinct table, and a join shuffling the
    * positions frame AGAIN — three corpus-scale exchanges per
    * doubling round. Dense rank collapses them to one:
    *
    *   1. range-partition the FULL frame on the keys (equal tuples
    *      never straddle a boundary) and pin the layout;
    *   2. one bounded collect of per-partition DISTINCT-key counts
    *      (≤ np rows of driver state);
    *   3. broadcast exclusive prefix offsets back; global dense_rank
    *      = offset + local `dense_rank()` in a pid-partitioned
    *      window.
    *
    * `row_number` over distinct sorted tuples ≡ `dense_rank` over the
    * full sorted frame, so the produced ranks are bit-identical to
    * the r5 chain — oracle hashes unchanged. `n` (total distinct
    * keys, the Manber–Myers fixpoint signal) falls out of the same
    * collect, job-free. */
  def withGlobalDenseRank(
      df: DataFrame,
      keys: Seq[Column],
      rankCol: String,
      numPartitions: Option[Int] = None): RankedFrame = {
    val np = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val order = keys.map(_.asc)
    val parted = df
      .repartitionByRange(np, order: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(Checkpoints.cut)
    val perPart: Array[Row] = parted
      .groupBy(col("__pid"))
      .agg(count_distinct(struct(keys: _*)).as("__nd"))
      .orderBy(col("__pid"))
      .collect()
    var off = 0L
    val offRows = perPart.map { r =>
      val row = Row(r.getInt(0).toLong, off); off += r.getLong(1); row
    }
    val total = off
    val spark = df.sparkSession
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__pid64", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        "__rkOff", org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val byPid = Window.partitionBy(col("__pid")).orderBy(order: _*)
    RankedFrame(
      parted
        .join(broadcast(offDf), parted("__pid").cast("long") === offDf("__pid64"))
        .withColumn(rankCol, (col("__rkOff") + dense_rank().over(byPid)).cast("long"))
        .drop("__pid", "__pid64", "__rkOff"),
      total)
  }

  /** The explicit ceil-division quantile bucket both engines floor
    * identically: `floor((rn·q + n − 1) / n)` as an IEEE division —
    * exact for any n < 2⁵³ (the q_rfm_segments formula). */
  def ceilBucket(rn: Column, q: Int, n: Long): Column =
    floor((rn * q + n - 1).cast("double") / lit(n).cast("double")).cast("long")
}
