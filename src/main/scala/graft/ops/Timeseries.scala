package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular observations onto a
  * fixed grid with last-observation-carried-forward fill — the standard
  * prep for joining sensor/metric/price streams against models that
  * expect aligned ticks.
  */
object Timeseries {

  /** Per-key gap-filled resampling: a tick grid of `step` (in the ts
    * column's unit) spans each key's OWN observed range (no global
    * bounds collect, no cross-key skew from one long-lived key), each
    * tick takes the bucket's LAST observation (latest (ts, tieCol))
    * and empty buckets carry the previous value forward (LOCF).
    *
    * Returns (key, tick, value) with no leading nulls (the grid starts
    * at each key's first observed bucket).
    *
    * Scale shape: bounds are one per-key min/max aggregate; the grid is
    * a narrow per-key explode (range/step rows); bucket-last is an
    * aggregate, not a window over raw events; the only window is the
    * LOCF fill, partitioned BY KEY over the (bounded) tick grid —
    * nothing global anywhere. */
  def gapFillLocf(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, step: Long,
                  tieCol: String): DataFrame = {
    require(step > 0, "step must be positive")
    val e = df.select(col(keyCol).as("key"), col(tsCol).as("ts"),
      col(valueCol).as("v"), col(tieCol).as("tie"))
    val bucket = (c: Column) => (floor(c / step) * step).cast("long")
    val bounds = e.groupBy("key")
      .agg(bucket(min(col("ts"))).as("lo"), bucket(max(col("ts"))).as("hi"))
    val ticks = bounds.select(col("key"),
      explode(sequence(col("lo"), col("hi"), lit(step))).as("tick"))
    val lastPerBucket = e
      .withColumn("tick", bucket(col("ts")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("key", "tick")
          .orderBy(col("ts").desc, col("tie").desc)))
      .where(col("__rn") === 1)
      .select(col("key"), col("tick"), col("v"))
    ticks.join(lastPerBucket, Seq("key", "tick"), "left")
      .withColumn("value", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy("key").orderBy("tick")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("key").as(keyCol), col("tick"), col("value"))
  }
}
