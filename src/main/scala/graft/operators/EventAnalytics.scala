package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the events stream (SURVEY §2.B
  * cont.) — funnel and cohort-retention, the two staples of
  * behavioral pipelines. Both are staged aggregations joined on
  * user_id: every stage is partial-aggregatable and the only shuffled
  * width is (user_id, one timestamp).
  */
object EventAnalytics {
  import graft.SparkEntry.QueryFn

  /** Strict-order funnel signup → view → purchase: each stage counts
    * users whose stage event happened after their previous stage's
    * first event. */
  val qEventsFunnel: QueryFn = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.filter($"event_type" === "view")
      .join(s1, "user_id").where($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase")
      .join(s2, "user_id").where($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_view_after")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
  }

  /** Day-0 cohort retention: users grouped by first-seen day, counted
    * per day offset they return on. */
  val qEventsRetention: QueryFn = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", date_trunc("day", $"ts").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("d0"))
    ev.join(first, "user_id")
      .groupBy(
        date_format($"d0", "yyyy-MM-dd").as("cohort"),
        datediff($"d", $"d0").cast("long").as("day_offset"))
      .agg(count_distinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"day_offset")
  }
}
