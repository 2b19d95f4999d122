package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over user activity streams — the funnel
  * operator of event-analytics engines (ClickHouse `windowFunnel`,
  * Amplitude-style conversion analysis), Spark-first.
  */
object EventOps {

  /** Ordered-funnel analysis: per user, how far through `steps` they
    * progressed, where step i+1 must occur STRICTLY after the matched
    * step i and within `window` of the matched step-1 time (the
    * window anchors at the funnel entry, ClickHouse-style). Matching is
    * greedy-earliest: each step matches its minimum qualifying
    * timestamp — the standard funnel semantics, deterministic with no
    * tie-break needed because min() is order-free.
    *
    * Returns (user, t1..tK nullable, steps_completed); users who never
    * performed step 1 are absent.
    *
    * Scale shape: K-1 rounds of (filtered scan ⋈ per-user state) +
    * per-user min aggregates, all hash-partitioned by user — each round
    * touches only that step's events (the `etype = step` predicate
    * pushes into the scan), and state is one row per qualifying user.
    * No window over all events, no per-user sort, no UDAF state. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], window: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(window > 0, "window must be positive")
    // Null users/timestamps drop up front, same rationale as
    // [[retention]]'s screen: a null-user group would emit a phantom
    // "user" permanently stuck at steps_completed = 1 (the step>=2
    // equi-joins on user reject NULL, so it can never progress), and a
    // null ts carries no funnel position.
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(typeCol).as("etype"))
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var acc = e.where(col("etype") === steps.head)
      .groupBy("user").agg(min("ts").as("t1"))
    levels += acc
    for (i <- 2 to steps.size) {
      val stepMin = e.where(col("etype") === steps(i - 1))
        .join(acc, Seq("user"))
        .where(col("ts") > col(s"t${i - 1}") &&
          col("ts") <= col("t1") + window)
        .groupBy("user").agg(min("ts").as(s"t$i"))
      acc = acc.join(stepMin, Seq("user"))
      levels += acc
    }
    var out = levels.head
    for (i <- 2 to steps.size)
      out = out.join(levels(i - 1).select(col("user"), col(s"t$i")),
        Seq("user"), "left")
    // when() chains evaluate in order, so build outermost = deepest
    // step; a 1-step funnel falls out naturally (empty fold range keeps
    // the lit(1L) init — no special case needed).
    val completedOrdered = (steps.size to 2 by -1)
      .foldRight(lit(1L): org.apache.spark.sql.Column) { case (i, els) =>
        when(col(s"t$i").isNotNull, lit(i.toLong)).otherwise(els)
      }
    out.withColumn("steps_completed", completedOrdered)
      .select(col("user").as(userCol) +: (1 to steps.size).map(i => col(s"t$i")) :+
        col("steps_completed"): _*)
  }

  /** Cohort retention: users grouped by the time bucket of their FIRST
    * event (the cohort); for each (cohort, offset) the count and
    * fraction of that cohort active `offset` buckets later. The other
    * half of product analytics next to [[funnel]].
    *
    * `bucketWidth` is in the ts column's unit (e.g. 604800000000 for
    * weekly cohorts over microsecond timestamps). Counts are exact
    * integers; the rate is rounded to 4 dp from exact counts, so the
    * result is engine- and partitioning-independent. Bucketing is pure
    * long arithmetic (a floor(ts/width) double quotient would
    * mis-bucket epoch-nano magnitudes above 2^53). Null-user events
    * are dropped up front: they are unattributable, and letting them
    * through would count them in cohort sizes while the null-rejecting
    * activity join could never count them active — silently deflating
    * every fraction of their cohort.
    *
    * Scale shape: one per-user min (cohort assignment), one distinct
    * over (user, bucket) — both hash-partitioned by user — then a
    * per-cohort count; cohort sizes re-join by the (tiny) cohort key. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Null timestamps drop with null users: a null ts would bucket to
    // null, ride through as (cohort, offset=null) garbage rows, and an
    // all-null-ts user would get cohort=null and vanish from the size
    // join while remaining possible in `active` — inconsistent both ways.
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"),
        Timeseries.bucketStart(col(tsCol), bucketWidth).as("__start"))
      // __start is an exact multiple of the width, so the integral
      // `div` (truncating) equals the true floored quotient — exact at
      // any magnitude, long arithmetic end to end.
      .withColumn("bucket", expr(s"__start div ${bucketWidth}L"))
      .drop("__start")
    val cohorts = e.groupBy("user").agg(min("bucket").as("cohort"))
    val active = e.distinct()
      .join(cohorts, Seq("user"))
      .withColumn("offset", col("bucket") - col("cohort"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = cohorts.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    active.join(sizes, Seq("cohort"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("n_cohort").cast("double"), 4))
      .select("cohort", "offset", "n_active", "n_cohort", "retention")
  }
}
