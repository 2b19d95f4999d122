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
    val e = events.select(col(userCol).as("user"), col(tsCol).as("ts"),
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
    // when() chains evaluate in order, so build outermost = deepest step
    val completedOrdered = (steps.size to 2 by -1)
      .foldRight(lit(1L): org.apache.spark.sql.Column) { case (i, els) =>
        when(col(s"t$i").isNotNull, lit(i.toLong)).otherwise(els)
      }
    out.withColumn("steps_completed",
        if (steps.size == 1) lit(1L) else completedOrdered)
      .select(col("user").as(userCol) +: (1 to steps.size).map(i => col(s"t$i")) :+
        col("steps_completed"): _*)
  }
}
