package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §3 preference (c)):
  * per-key top-k without a total per-partition sort.
  *
  * The declarative alternative — `row_number().over(partitionBy(key)
  * .orderBy(ord))` then `filter(rn <= k)` — must sort every row of
  * every partition before it can rank. This operator keeps one
  * bounded heap per key: a *partial* pass per input partition feeds
  * at most k rows per (partition, key) into the shuffle
  * (EnsureRequirements inserts the exchange to satisfy the final
  * node's ClusteredDistribution), and a *final* pass merges. At 100 TB
  * with hot keys, the shuffle carries O(partitions × k) rows per key
  * instead of all of them — the same partial/final shape Spark's own
  * aggregates use, applied to an operator Catalyst doesn't provide.
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ascending "comes first in the requested order" comparator;
      // scala PQ dequeues the MAX, i.e. the currently-worst row
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toArray.sorted(ord).iterator)
    }
  }
}

object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ord, k, child) =>
      TopKPerKeyExec(keys, ord, k, partial = false,
        TopKPerKeyExec(keys, ord, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `TopK.perKey(df, Seq("event_type"),
  * Seq("value" -> false, "event_id" -> true), 3)` — order fields as
  * (name, ascending). */
object TopK {
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0)
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val ordering = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val plan = TopKPerKeyPlan(keyCols.map(attr), ordering, k, analyzed)
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, plan)
  }
}
