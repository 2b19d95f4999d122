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

  /** Exact integer bucket start: `c - pmod(c, step)` in pure long
    * arithmetic. The ONE definition shared by [[gapFillLocf]],
    * [[EventOps.retention]], and [[RangeJoin]]: `floor(c/step)*step`
    * routes through a DOUBLE quotient, which mis-buckets magnitudes
    * above 2^53 (epoch nanos are ~1.6e18). */
  private[ops] def bucketStart(c: Column, step: Long): Column =
    c.cast("long") - pmod(c.cast("long"), lit(step))

  /** Per-key exponentially-weighted moving average (final value):
    * ewma_i = α·x_i + (1−α)·ewma_{i−1}, seeded with the key's first
    * observation — the classic SEQUENTIAL recurrence, made distributed
    * by folding each key's ordered value array once (one shuffle to
    * group, then a narrow fused fold; no iterative jobs, no windows).
    * Returns (keyCol, ewma, n).
    *
    * State bound: one key's full series materializes as an in-memory
    * array during the fold — fine for per-entity event streams
    * (thousands of points/key); re-bucket the key (e.g. per day) when
    * a single key's history is unbounded.
    *
    * Determinism: `orderCols` must be a unique order (e.g. ts + id);
    * the fold is left-to-right over that order, so engines replay it
    * exactly (same IEEE ops in the same order — pick an α whose 1−α is
    * binary-exact, e.g. 0.25/0.5/0.75, for cross-engine bit equality).
    *
    * Null discipline: rows whose value is null (or a non-numeric
    * string, which casts to null) are DROPPED before the fold and `n`
    * counts only the folded observations — one unscreened null would
    * poison the entire key's recurrence to NULL with no trace of which
    * row caused it. NON-FINITE values (NaN/±Infinity — including the
    * strings "NaN"/"Infinity", which cast to non-null doubles and so
    * passed the null screen) are dropped for the same reason: one NaN
    * poisons every later fold step of its key to NaN, the exact
    * whole-key outcome this screen exists to prevent. A key whose
    * values are ALL null/non-finite is absent. */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double, roundScale: Int = 4): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(orderCols.nonEmpty, "need at least one order column")
    val vd = col(valueCol).cast("double")
    val fields = orderCols.map(col) :+ vd.as("__v")
    val g = df.where(vd.isNotNull && !isnan(vd) &&
        vd =!= Double.PositiveInfinity && vd =!= Double.NegativeInfinity)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(fields: _*))).as("__s"))
    val vs = transform(col("__s"), s => s("__v"))
    g.select(col(keyCol),
      round(aggregate(
        slice(vs, lit(2), greatest(size(vs) - 1, lit(0))),
        element_at(vs, 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), roundScale)
        .as("ewma"),
      size(col("__s")).cast("long").as("n"))
  }

  /** Per-key gap-filled resampling: a tick grid of `step` (in the ts
    * column's unit) spans each key's OWN observed range (no global
    * bounds collect, no cross-key skew from one long-lived key), each
    * tick takes the bucket's LAST observation (latest (ts, tieCol))
    * and empty buckets carry the previous value forward (LOCF).
    *
    * Returns (key, tick, value). The grid starts at each key's first
    * observed bucket, so `value` has no leading nulls PROVIDED the
    * first bucket's winning observation has a non-null value; observed
    * NULL values are treated as "no observation" by the fill (the
    * ignoreNulls LOCF carries the previous non-null forward — the
    * output does not distinguish an observed null from a gap; screen
    * nulls upstream if that distinction matters).
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
    val bucket = (c: Column) => bucketStart(c, step) // exact long arithmetic
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
    // Null-safe on key: a null-key group gets its grid and LOCF like
    // any other (the plain equi-join would fabricate an all-null grid
    // for it — the groupBys keep the null group but `null = null` never
    // matches, so its observed values could never join back).
    ticks.join(
        lastPerBucket.withColumnRenamed("key", "__k")
          .withColumnRenamed("tick", "__t"),
        col("key") <=> col("__k") && col("tick") <=> col("__t"), "left")
      .drop("__k", "__t")
      .withColumn("value", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy("key").orderBy("tick")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("key").as(keyCol), col("tick"), col("value"))
  }
}
