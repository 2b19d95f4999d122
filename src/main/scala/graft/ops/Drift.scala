package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * guardrail a continuously-ingesting training pipeline runs before a
  * new crawl batch is allowed to shift the data mixture (language mix
  * collapse, length distribution drift, domain imbalance).
  *
  * Population Stability Index per bucket:
  *   psi = Σ_b (p_b − q_b) · ln(p_b / q_b)
  * with an epsilon floor so an empty bucket on either side contributes a
  * large-but-finite score instead of ±∞. KL(ref ‖ cur) rides along from
  * the same per-bucket proportions.
  *
  * Rule-of-thumb thresholds (credit-risk lineage, standard in data
  * monitoring): psi < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.
  *
  * Null handling: a null bucket value (missing language, null length)
  * is a real population — it gets its own [[NullBucket]] label on BOTH
  * sides, so a null-rate regression shows up as drift in that bucket
  * instead of being mis-attributed or dropped.
  *
  * Scale shape: one narrow aggregate per snapshot (only the bucket
  * column is read — at 100 TB the scans prune to a single column and the
  * groupBy is map-side combined), then a full outer join on the bucket
  * key, whose cardinality is the number of DISTINCT buckets (languages,
  * length bands, domains) — tiny by construction. Nothing corpus-sized
  * ever shuffles or reaches the driver.
  */
object Drift {

  /** Label rows whose bucket expression is null land in — a sentinel
    * (not SQL NULL) so the full-outer join matches the bucket across
    * sides (NULL keys never equi-join) and the "missing" population is
    * compared like any other. */
  val NullBucket = "<graft-null-bucket>"

  /** Per-bucket drift contributions between a reference snapshot and a
    * current snapshot. `bucket` is any categorical expression over the
    * rows (a column, a CASE over ranges, [[numericBucket]]...).
    *
    * Returns one row per bucket present in EITHER snapshot:
    * (bucket, n_ref, n_cur, p_ref, p_cur, psi_contrib, kl_contrib),
    * proportions and contributions rounded to `scale` decimals so two
    * engines computing the same doubles agree bit-for-bit.
    */
  def bucketContributions(ref: DataFrame, cur: DataFrame, bucket: Column,
                          eps: Double = 1e-6, scale: Int = 6): DataFrame =
    bucketContributionsFromCounts(
      sideCounts(ref, bucket, "n_ref"), cur, bucket, eps, scale)

  /** Floored proportion n/t. An EMPTY side has t = 0, and 0/0 in double
    * is NaN — which Spark orders GREATEST, so greatest(NaN, eps) stays
    * NaN, every contribution goes NaN, and a driver-side `psi > 0.25`
    * check reads the one snapshot that should scream (an empty crawl
    * batch) as STABLE (`NaN > 0.25` is false in Scala). A zero total
    * routes to the eps floor instead, so every bucket contributes its
    * large-but-finite score and the monitor fires. */
  private def flooredProportion(n: Column, t: Column, eps: Double): Column =
    greatest(when(t > 0, n / t).otherwise(lit(0.0)), lit(eps))

  /** One side's bucket histogram: (bucket, <n>) — the precompute for
    * [[bucketContributionsFromCounts]] when the reference corpus is
    * large or scored repeatedly (streaming: aggregate the 100 TB
    * reference ONCE, score every micro-batch against the tiny result). */
  def sideCounts(df: DataFrame, bucket: Column, n: String): DataFrame =
    df.select(coalesce(bucket.cast("string"), lit(NullBucket)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(n))

  /** [[bucketContributions]] against an already-aggregated reference
    * histogram `refCounts` = (bucket string, n_ref long); a null bucket
    * label in `refCounts` is normalized to [[NullBucket]].
    *
    * `refCounts` is re-aggregated by bucket before the join: unioned
    * shard histograms (the natural way to accumulate a streaming
    * reference) or a SQL-NULL row collapsing onto a literal
    * [[NullBucket]] row would otherwise fan out the full-outer join and
    * double-count that bucket in every proportion. The re-aggregate is
    * over the bucket-cardinality table — free. */
  def bucketContributionsFromCounts(refCounts: DataFrame, cur: DataFrame,
                                    bucket: Column, eps: Double = 1e-6,
                                    scale: Int = 6): DataFrame = {
    val r = refCounts.select(
      coalesce(col("bucket").cast("string"), lit(NullBucket)).as("bucket"),
      col("n_ref").cast("long").as("n_ref"))
      .groupBy("bucket").agg(sum("n_ref").as("n_ref"))
    val c = sideCounts(cur, bucket, "n_cur")
    val joined = r.join(c, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // Totals over ALL buckets via a constant-key window: the window's
    // input is the already-aggregated bucket table (bounded by bucket
    // cardinality), and unlike a totals-aggregate + cross join it
    // evaluates `joined`'s lineage exactly ONCE. The lit(0) partition
    // key keeps the partitionSpec non-empty (no stray "no partition
    // defined" warnings; the plan gate allows windows over aggregated
    // input either way).
    val wAll = Window.partitionBy(lit(0))
    val withTotals = joined
      .withColumn("__t_ref", sum("n_ref").over(wAll))
      .withColumn("__t_cur", sum("n_cur").over(wAll))
    val p = flooredProportion(col("n_ref"), col("__t_ref"), eps)
    val q = flooredProportion(col("n_cur"), col("__t_cur"), eps)
    withTotals
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(p, scale).as("p_ref"),
        round(q, scale).as("p_cur"),
        round((p - q) * log(p / q), scale).as("psi_contrib"),
        round(p * log(p / q), scale).as("kl_contrib"))
  }

  /** Contributions for MANY features in ONE corpus pass. `isRef` splits
    * one frame into the reference side (true) and current side (false
    * or null); each (name, bucket expression) feature explodes to a
    * (feature, bucket) pair per row. At 100 TB this is the shape that
    * matters: scoring F features costs one scan + one shuffle of
    * (feature, bucket) pairs, not 2·F scans; the per-feature totals
    * come from a feature-partitioned window over the bucket table
    * (bounded input, single evaluation — no join, no re-execution).
    *
    * Same output schema and identical arithmetic per feature as
    * [[bucketContributions]] (asserted in DriftSpec), plus the leading
    * `feature` column. */
  def multiFeatureContributions(df: DataFrame, isRef: Column,
                                features: Seq[(String, Column)],
                                eps: Double = 1e-6,
                                scale: Int = 6): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val pairs = array(features.map { case (n, b) =>
      struct(lit(n).as("feature"),
        coalesce(b.cast("string"), lit(NullBucket)).as("bucket")) }: _*)
    val counts = df
      .select(explode(pairs).as("fb"),
        when(isRef, 1L).otherwise(0L).as("__r"))
      .groupBy(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"))
      .agg(sum("__r").as("n_ref"), sum(lit(1L) - col("__r")).as("n_cur"))
    val wFeature = Window.partitionBy("feature")
    val withTotals = counts
      .withColumn("__t_ref", sum("n_ref").over(wFeature))
      .withColumn("__t_cur", sum("n_cur").over(wFeature))
    val p = flooredProportion(col("n_ref"), col("__t_ref"), eps)
    val q = flooredProportion(col("n_cur"), col("__t_cur"), eps)
    withTotals
      .select(col("feature"), col("bucket"), col("n_ref"), col("n_cur"),
        round(p, scale).as("p_ref"),
        round(q, scale).as("p_cur"),
        round((p - q) * log(p / q), scale).as("psi_contrib"),
        round(p * log(p / q), scale).as("kl_contrib"))
  }

  /** Total PSI between the snapshots (sum of [[bucketContributions]]).
    * Both snapshots empty → no buckets → 0.0 (no population on either
    * side IS the same distribution; the bare sum would be null and
    * NPE at getDouble). */
  def psi(ref: DataFrame, cur: DataFrame, bucket: Column,
          eps: Double = 1e-6): Double =
    bucketContributions(ref, cur, bucket, eps, scale = 12)
      .agg(coalesce(sum("psi_contrib"), lit(0.0))).head().getDouble(0)

  /** Fixed-breaks numeric bucketing: value < breaks(0) -> 0,
    * breaks(i-1) <= value < breaks(i) -> i, value >= last -> breaks.size;
    * a NULL value buckets to NULL (which the contribution functions
    * then label [[NullBucket]]), never to the top band. Explicit
    * literal breaks (not sampled quantiles) so the bucket ids are
    * stable across snapshots and engines — drift monitoring needs the
    * HISTOGRAM frozen, only the masses moving. */
  def numericBucket(value: Column, breaks: Seq[Double]): Column = {
    require(breaks.nonEmpty && breaks == breaks.sorted, "breaks must be sorted")
    val banded = breaks.zipWithIndex.foldRight(lit(breaks.size): Column) {
      case ((b, i), rest) => when(value < b, lit(i)).otherwise(rest)
    }
    // NaN joins the NULL bucket, not the top band: NaN < b is false
    // for every break (NaN orders greatest), so a scorer regression
    // emitting NaN used to read as top-band mass growth — drift
    // mis-attributed to "high values" instead of surfacing as the
    // distinct missing/undefined population the NullBucket design
    // exists for (and masking any real top-band shift).
    when(value.isNull || isnan(value.cast("double")), lit(null).cast("int"))
      .otherwise(banded)
  }
}
