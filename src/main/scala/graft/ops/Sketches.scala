package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

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

  /** Per-group Count-Min frequency sketches (Cormode & Muthukrishnan
    * 2005): one pass, `depth x width` long counters each, built by
    * Spark's codegen'd `count_min_sketch` aggregate. The shard-side
    * half of the heavy-hitter pattern: build per shard/day, persist the
    * bytes, and answer "how often does value v occur?" later for ANY v
    * without rescanning. Estimates overcount only (never under), by at
    * most eps·N with the given confidence. */
  def buildFreqSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        eps: Double = 0.001, confidence: Double = 0.99,
                        seed: Int = 42): DataFrame =
    // Cast to string BEFORE sketching: CountMinSketch hashes longs and
    // UTF-8 string bytes into DIFFERENT cells, and the query side
    // ([[heavyHitters]]) probes with strings — sketching a BIGINT
    // column raw would silently estimate ~0 for every true heavy
    // hitter. The Column-based builtin also survives column names
    // (spaces, dots) that a spliced SQL string would not parse.
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol).cast("string"),
        lit(eps), lit(confidence), lit(seed)).as("sketch"))

  /** Merge persisted Count-Min sketch bytes driver-side (sketches are
    * KB–MB sized — collecting them is the point: a year of shard
    * sketches merges in milliseconds where a rescan would read 100 TB).
    * Cell-wise addition makes merge EXACTLY equal to having built one
    * sketch over the union (same seed ⇒ same hash functions). */
  def mergeFreqSketches(sketches: DataFrame,
                        sketchCol: String = "sketch",
                        maxSketches: Int = 1024): CountMinSketch = {
    // Bounded collect: "KB–MB sized" holds PER SKETCH, not for the
    // collected total — at the default eps a CMS is ~112 KB, so an
    // unbounded per-(fine-grained-group) sketch table reached GBs on
    // the driver before the merge loop. limit(max+1) makes the bound
    // itself one bounded job, not a count-then-collect double read.
    val rows = sketches.select(col(sketchCol)).limit(maxSketches + 1).collect()
    require(rows.nonEmpty, "no sketches to merge (shard selection empty?)")
    require(rows.length <= maxSketches,
      s"mergeFreqSketches: more than $maxSketches sketch rows — merge " +
        "hierarchically (merge per coarser group first) or raise maxSketches " +
        "deliberately (each CMS is ~eps-sized: ~112 KB at the default)")
    rows.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
      .reduce(_ mergeInPlace _)
  }

  /** Screen candidate values against a merged sketch: returns each
    * candidate's estimated count, keeping those >= minCount — the
    * query-side half of heavy-hitter detection (candidates come from a
    * cheap per-shard top-k or a sample; the sketch gives whole-corpus
    * counts without the corpus-wide groupBy). */
  def heavyHitters(cms: CountMinSketch, candidates: Seq[String],
                   minCount: Long): Seq[(String, Long)] =
    candidates.distinct
      .map(v => v -> cms.estimateCount(v))
      .filter(_._2 >= minCount)
      .sortBy { case (v, c) => (-c, v) }

  /** Single-pass approximate quantiles per group (positional-error
    * bounded: rank error <= 1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      probabilities: Seq[Double],
                      accuracy: Int = 10000): DataFrame = {
    val probs = array(probabilities.map(lit): _*)
    // Non-finite screen for FLOATING inputs (integral types cannot
    // hold NaN/Inf, and percentile_approx preserves the input type —
    // an unconditional double cast would change integral outputs): NaN
    // folds into percentile_approx as the GREATEST value — one NaN per
    // group made p=1.0 report NaN and shifted every other quantile's
    // rank — and ±Infinity pins the extreme quantiles. The KLL twin
    // (buildQuantileShardSketches) silently DROPS NaN, so without the
    // screen the two documented twins disagreed on identical data;
    // null-as-missing matches both the KLL path and the exact
    // percentile screens.
    val v = col(valueCol)
    val screened = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        when(isnan(v) || v === Double.PositiveInfinity ||
          v === Double.NegativeInfinity, lit(null)).otherwise(v)
      case _ => v
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(screened, probs, lit(accuracy)).as("approx_quantiles"))
  }

  /** Per-partition KLL quantile sketch bytes — the PERSISTABLE quantile
    * sketch (percentile_approx's summary cannot leave the query).
    * One row of bytes per partition/shard; a few KB each at the default
    * k=200 (~1.65% rank error). Build once per shard at write time,
    * persist next to the data, and answer later quantile queries over
    * any shard subset by merging sketches instead of rescanning — the
    * quantile leg of the HLL/CMS shard-merge pattern above.
    * (No native Spark KLL aggregate exists, hence mapPartitions; the
    * pass is narrow and emits one row per partition.) */
  def buildQuantileShardSketches(df: DataFrame, valueCol: String,
                                 k: Int = 200): DataFrame = {
    import org.apache.spark.sql.Encoders
    // Nulls are skipped (the aggregate-based builders' semantics);
    // unguarded, the primitive-Double decode would throw on the first
    // null. Filter AFTER the cast so un-castable values (null-yielding
    // casts) are skipped too, not just literal nulls.
    df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .as[Double](Encoders.scalaDouble)
      .mapPartitions { it =>
        val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        it.foreach(sk.update)
        Iterator.single(sk.toByteArray)
      }(Encoders.BINARY)
      .toDF("sketch")
  }

  /** Merge persisted KLL sketch bytes driver-side (KBs per shard —
    * collecting them is the point). KLL merge is a true union: the
    * merged sketch carries the same rank-error guarantee as one built
    * over the concatenated data. */
  def mergeQuantileSketches(sketches: DataFrame, sketchCol: String = "sketch",
                            maxSketches: Int = 16384)
      : org.apache.datasketches.kll.KllDoublesSketch = {
    // Same bounded-collect discipline as mergeFreqSketches (KLL is
    // ~2-5 KB/sketch, so the default bound is ~50 MB of driver bytes).
    val rows = sketches.select(col(sketchCol)).limit(maxSketches + 1).collect()
    require(rows.nonEmpty, "no sketches to merge (shard selection empty?)")
    require(rows.length <= maxSketches,
      s"mergeQuantileSketches: more than $maxSketches sketch rows — merge " +
        "hierarchically or raise maxSketches deliberately")
    rows.map(r => org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]](0))))
      .reduceLeft { (a, b) => a.merge(b); a }
  }

  /** Quantile estimates from a (merged) KLL sketch. */
  def quantilesFrom(sk: org.apache.datasketches.kll.KllDoublesSketch,
                    probabilities: Seq[Double]): Seq[Double] =
    probabilities.map(p =>
      sk.getQuantile(p, org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
}
