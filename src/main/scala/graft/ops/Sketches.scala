package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate, MERGEABLE aggregates — the 100 TB profiling pattern:
  * build bounded-memory sketches once per shard/partition in a single
  * pass, persist them as bytes, and merge + estimate later without
  * rescanning (estimating distinct users over a year of shards becomes
  * a merge over kilobyte sketches instead of a corpus scan).
  *
  * Built on Spark's native Apache DataSketches HLL integration
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) and
  * `approx_count_distinct` (HLL++) / `percentile_approx` (an
  * approximate quantile summary) — all codegen'd built-ins, no UDFs.
  *
  * These have NO DuckDB-oracle driver query on purpose: sketch outputs
  * are implementation-defined, so cross-engine hash-matching is
  * impossible; the exact twins (q_events_distinct_users, q_percentiles)
  * are the oracle-checked queries, and SketchesSpec bounds the relative
  * error of every estimator against the exact answers. */
object Sketches {

  /** Per-group HLL distinct-count estimate (HLL++, single pass). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Build one persistable DataSketches HLL sketch per group — the
    * shard-side half of the merge pattern. `lgConfigK` trades sketch
    * size (2^lgConfigK buckets) for accuracy. */
  def buildDistinctSketches(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Merge previously-built sketches (e.g. across shards/days) and
    * estimate — no rescan of the underlying data. */
  def mergeAndEstimate(sketches: DataFrame, groupCols: Seq[String],
                       sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false)))
        .as("approx_distinct"))

  /** Single-pass approximate quantiles per group (positional-error
    * bounded: rank error <= 1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      probabilities: Seq[Double],
                      accuracy: Int = 10000): DataFrame = {
    val probs = array(probabilities.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), probs, lit(accuracy)).as("approx_quantiles"))
  }
}
