package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Backward as-of join — the temporal operator Spark's built-ins lack
  * (DuckDB ships it as `ASOF JOIN`, which is exactly what the oracle
  * uses, making the check independent of this implementation).
  *
  * Implementation is the scale-safe sort-merge formulation, not a
  * per-row subquery and not an inequality join (both quadratic in the
  * worst case): tag both sides, union them, and carry the right
  * side's payload forward with `last(_, ignoreNulls)` over a
  * (key, time)-ordered running window. Cost = ONE shuffle of
  * |left| + |right| rows on the key plus a per-key sort — the same
  * plan shape at any scale, skew-bounded by the hottest key, and
  * Spark's window with a running (unbounded-preceding) frame streams
  * in one pass without buffering the partition.
  */
object AsOf {
  import graft.SparkEntry.QueryFn

  /** left rows matched to the latest right row with
    * rightTime <= leftTime (per key). Right payload columns come back
    * null when no prior right row exists. Equal timestamps: the right
    * row sorts first, so a same-instant right row IS visible to the
    * left row (the `>=` convention, matching DuckDB ASOF). */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // right rows: is_left=0 sorts before ties; payload carried as-is
    val r = right.select(
      col(key) +: col(rightTime).as("__t") +: lit(0).as("__is_left") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        payload.map(col): _*)
    val l = left.select(
      col(key) +: col(leftTime).as("__t") +: lit(1).as("__is_left") +:
        leftCols.filterNot(_ == key).map(col) ++:
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.where(col("__is_left") === 1).drop("__t", "__is_left")
  }

  /** Each event matched to the user's most recent order at event time:
    * the "state at time of interaction" join every event pipeline
    * needs (feature freshness, attribution, billing state). */
  val qAsofJoin: QueryFn = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"event_id", $"ts")
    val od = Tables.orders(s, dir)
      .select($"o_custkey".as("user_id"), $"o_orderdate")
    asofBackward(ev, od,
      key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderdate"))
      .select(
        $"user_id", $"event_id",
        date_format($"o_orderdate", "yyyy-MM-dd").as("last_order_date"),
        datediff(to_date($"ts"), to_date($"o_orderdate")).cast("long").as("days_since"))
      .orderBy($"user_id", $"event_id")
  }
}
