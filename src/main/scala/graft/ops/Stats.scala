package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped statistical screens — the anomaly-detection siblings of the
  * quality filters: flag rows whose value deviates from their group.
  */
object Stats {

  /** Broadcast-join per-group aggregates back onto the scan, NULL-SAFE
    * on the group keys: a plain equi-join silently drops every row
    * whose group key is null — the groupBy pays to compute the null
    * group's aggregate, then the join back never matches it, so null-
    * group outliers vanish with no error (the recurring null-key
    * pattern). `<=>` treats null as a group like any other. */
  /** The screens join fixed-name stat columns back onto the caller's
    * frame; a frame that already carries one of those names would hit
    * an ambiguous-reference AnalysisException deep inside the join.
    * Fail at the API boundary with the actual contract instead. */
  private def requireFreshColumns(df: DataFrame, op: String,
                                  names: Seq[String]): Unit = {
    val clash = graft.Cols.overlap(df, names)
    require(clash.isEmpty,
      s"$op appends column(s) ${names.mkString(", ")}; the input already " +
        s"has ${clash.mkString(", ")} — rename or drop before calling")
  }

  private def joinGroupsNullSafe(df: DataFrame, grouped: DataFrame,
                                 groupCols: Seq[String]): DataFrame = {
    // The empty-groupCols aggregate is ONE row — bounded by
    // construction, hint it. The per-group table's cardinality is
    // data-dependent (caller-supplied groupCols over an arbitrary
    // corpus can yield billions of groups), so NO forced hint there: a
    // forced broadcast bypasses every size check and collects the full
    // table to the driver. AQE broadcasts it at runtime when it
    // measures small — the common case costs the same.
    if (groupCols.isEmpty) return df.crossJoin(broadcast(grouped))
    val renamed = groupCols.foldLeft(grouped) {
      case (g, c) => g.withColumnRenamed(c, s"__g_$c")
    }
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(renamed, cond).drop(groupCols.map(c => s"__g_$c"): _*)
  }

  /** Non-finite doubles (NaN/±Infinity) normalized to NULL for the
    * quantile/fence machinery: Spark orders NaN GREATER than every
    * number, so an unscreened NaN reaching a percentile makes the
    * interpolated threshold itself NaN — `x >= NaN` and `x < NaN`
    * comparisons then silently invert whole groups (everything
    * dropped/flagged except the NaN row). Infinity similarly pins a
    * fence at ±Inf and disables the screen. Treating non-finite as
    * NULL routes such rows through the SAME documented null contract
    * each caller already has. */
  private def finiteOrNull(c: Column): Column = {
    val d = c.cast("double")
    when(isnan(d) || d === Double.PositiveInfinity ||
      d === Double.NegativeInfinity, lit(null).cast("double")).otherwise(d)
  }

  /** Per-group z-score outliers: rows with |value − mean| ≥ threshold·σ
    * of their group (population σ). The determinism discipline: sum and
    * sum-of-squares run through EXACT DECIMAL aggregation (order-free,
    * so partitioning cannot change them), and only then drop to double
    * for the mean/variance divisions — identical expression shape on
    * any engine; the z-score is rounded before the threshold compare.
    *
    * The cast is decimal(18,6) — NOT wider — because the sum-of-squares
    * must also be exact: (18,6)×(18,6) = (37,12) is the largest square
    * that still fits decimal(38) identically on Spark and DuckDB. The
    * exactness domain is therefore |value| < 10^12 with ≤6 fractional
    * digits; values finer than 1e-6 are rounded before the moments —
    * AND, per group, Σ value² < 10^26 (the decimal(38,12) sum's integer
    * headroom): a million-row group is safe up to |value| ≈ 10^10, and
    * an overflow fails LOUD under Spark 4's default ANSI mode rather
    * than silently nulling the group's moments.
    *
    * Null values are excluded from the moments (count(v), matching the
    * sums, which skip nulls — count(*) would bias mean and σ low in any
    * group with null scores) and null-valued rows can never be flagged
    * (their z is null). A constant-valued group flags nothing: float
    * cancellation can leave the variance a hair NEGATIVE, and sqrt of
    * that is NaN — which Spark orders GREATER than every number, so
    * both `|z| >= t` and `sigma > 0` would turn true and flag the whole
    * group; the greatest(·, 0) clamp pins it to σ = 0 on both engines.
    *
    * Returns the input columns plus (mean, sigma, z) for flagged rows.
    *
    * Scale shape: one partial-aggregated groupBy for the moments (tiny
    * result: one row per group), joined back onto the scan (AQE
    * broadcasts it at runtime when it measures small — group
    * cardinality is data-dependent, so no FORCED hint) — the
    * full pass is one narrow projection + filter. */
  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     threshold: Double = 3.0, roundScale: Int = 4): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    requireFreshColumns(df, "zscoreOutliers", Seq("mean", "sigma", "z"))
    val v = col(valueCol).cast("decimal(18,6)")
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("__n"),
        sum(v).cast("double").as("__s"),
        sum(v * v).cast("double").as("__ss"))
      .withColumn("mean", col("__s") / col("__n"))
      .withColumn("sigma",
        sqrt(greatest(col("__ss") / col("__n") - col("mean") * col("mean"),
          lit(0.0))))
      .drop("__n", "__s", "__ss")
    joinGroupsNullSafe(df, moments, groupCols)
      .withColumn("z", round(
        (col(valueCol).cast("double") - col("mean")) / col("sigma"), roundScale))
      .where(abs(col("z")) >= threshold && col("sigma") > 0.0)
      .withColumn("mean", round(col("mean"), roundScale))
      .withColumn("sigma", round(col("sigma"), roundScale))
  }

  /** Per-group IQR (Tukey-fence) outliers — the robust complement to
    * [[zscoreOutliers]]: a handful of extreme rows can't move the
    * quartiles the way they move a mean/σ, so the fences hold on
    * heavy-tailed value streams. Rows outside
    * [q1 − k·iqr, q3 + k·iqr] are flagged (k = 1.5 classic).
    *
    * Determinism: `percentile` is Spark's EXACT interpolated quantile
    * (same linear interpolation as DuckDB's quantile_cont — already
    * relied on by q_percentiles); both quartiles are rounded before the
    * fences are derived, so the comparison operates on doubles that are
    * bit-identical across engines and partitionings.
    *
    * Scale shape: one grouped exact-percentile aggregate (one row per
    * group; percentile is a sort-based agg — fine for bounded group
    * count, use approx quantiles via [[graft.ops.Sketches]] when groups
    * are huge), joined back onto the scan (AQE-sized, no forced
    * broadcast — group cardinality is data-dependent); the screen is a
    * narrow filter. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 1.5, roundScale: Int = 4): DataFrame = {
    require(k > 0, "k must be positive")
    requireFreshColumns(df, "iqrOutliers", Seq("q1", "q3", "lo", "hi"))
    // Column-based percentile builtin, NOT an expr(...) SQL splice — no
    // string re-assembly of the column name or the threshold between
    // the API and the aggregate (the hazard Sketches.buildFreqSketches
    // documents; any name col() resolves works here).
    // Quartiles over FINITE values only (see finiteOrNull: one NaN in
    // the group made both fences NaN, flagging every good row and
    // passing the NaN row — inverted output). A non-finite VALUE is
    // itself flagged: NaN/Inf measurements are anomalies by any
    // definition, and the old NaN-comparison semantics silently passed
    // them clean.
    val v = finiteOrNull(col(valueCol))
    val fences = df.groupBy(groupCols.map(col): _*)
      .agg(round(percentile(finiteOrNull(col(valueCol)), lit(0.25)), roundScale).as("q1"),
        round(percentile(finiteOrNull(col(valueCol)), lit(0.75)), roundScale).as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * k)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * k)
    joinGroupsNullSafe(df, fences, groupCols)
      .where(v < col("lo") || v > col("hi") ||
        (col(valueCol).isNotNull && v.isNull))
  }

  /** Per-group quantile-threshold filter — FineWeb-style "keep the top
    * (1−q) fraction by quality score WITHIN each language/domain": rows
    * whose value >= their group's exact interpolated q-quantile
    * survive, with the threshold returned alongside (`thr`). Groups
    * score against their own distribution, so a weak language isn't
    * wiped out by a strong one's scale.
    *
    * Determinism: the exact `percentile` aggregate (== DuckDB
    * quantile_cont, the q_percentiles-pinned equivalence) rounded to
    * `roundScale` BEFORE the compare — no float-order or engine drift
    * at the boundary. Score ties at the threshold all survive, so the
    * kept fraction is >= (1−q), never an arbitrary tie cut.
    *
    * Scale shape: one grouped percentile aggregate (one row per group)
    * joined back onto the scan (AQE-sized, no forced broadcast —
    * group cardinality is data-dependent); the filter itself is a narrow
    * projection — same plan family as [[iqrOutliers]].
    *
    * NULL (and non-finite — NaN/±Infinity normalize to null, see
    * finiteOrNull) values: by default (`keepNullValues = false`) rows
    * whose `valueCol` is null are DROPPED — `null >= thr` is null — and the
    * percentile ignores them, so a null-rate regression in the quality
    * score silently shrinks the corpus. If the score can legitimately be
    * null (scorer outage, new unscored docs), pass
    * `keepNullValues = true` to route those rows through the gate
    * unfiltered (their `thr` is still attached for downstream triage),
    * or monitor the null rate separately with [[profile]] /
    * [[graft.ops.Drift]] (which gives nulls their own bucket). */
  def keepAboveQuantile(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, q: Double,
                        roundScale: Int = 4,
                        keepNullValues: Boolean = false): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile out of (0,1): $q")
    requireFreshColumns(df, "keepAboveQuantile", Seq("thr"))
    // Non-finite scores route through the SAME null knob (see
    // finiteOrNull): pre-screen, a NaN score passed the gate against
    // any finite threshold (NaN orders greatest), and one NaN reaching
    // the percentile made the group's threshold NaN — wiping the whole
    // group except its NaN row.
    val v = finiteOrNull(col(valueCol))
    val thr = df.groupBy(groupCols.map(col): _*)
      .agg(round(percentile(finiteOrNull(col(valueCol)), lit(q)), roundScale).as("thr"))
    val pass = v >= col("thr")
    joinGroupsNullSafe(df, thr, groupCols)
      .where(if (keepNullValues) v.isNull || pass else pass)
  }

  /** Numeric column profile — the observability pass next to the
    * [[Checks]] constraint gate: one row per column with row/null
    * counts, exact distinct count, min/max, and a DECIMAL-exact mean
    * (the double division of two exact numbers is engine-identical).
    * "Exact" here means: each value is rounded to 12 fractional digits
    * (decimal(38,12) — a binary double is dyadic so it can never sit
    * exactly on a decimal half-way point, making the rounding
    * engine-independent), then summed with no further error; the mean
    * is exact for inputs with ≤12 fractional digits and |x| < 10^26.
    * Sub-1e-12 magnitudes lose precision — profile a scaled copy of
    * such a column.
    * One aggregation job per column batch over a single scan each;
    * every aggregate is partial-agg friendly except the exact distinct
    * (two-phase) — swap in approx_count_distinct via
    * [[Sketches.approxDistinct]] when cardinality is huge and 2% error
    * is fine. */
  def profile(df: DataFrame, cols: Seq[String],
              roundScale: Int = 4): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min"),
        max(col(c)).cast("double").as("max"),
        round(sum(col(c).cast("decimal(38,12)")).cast("double") /
          count(col(c)), roundScale).as("mean"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min"), col("max"), col("mean"))
    }.reduce(_ unionByName _)
  }
}
