package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-deterministic only for a FIXED partitioning —
  * repartition the input and membership changes, which poisons
  * reproducibility at scale (AQE, file splits, and cluster size all
  * change partitioning). These samplers decide membership from a
  * sha-derived hash of a row KEY instead: the same row is in or out
  * regardless of partitioning, executor count, or engine — and an
  * external SQL engine can reproduce the exact sample (the hash is
  * [[HashFunctions.hash60]], see q_sample_stratified's oracle).
  */
object Sampling {

  /** Parts-per-million membership threshold for a fraction. */
  private def ppm(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    math.round(fraction * 1000000.0)
  }

  /** The ONE salted decision hash every sampler here derives from:
    * hash60(prefix || key-as-string), NULL keys coalesced to a fixed
    * sentinel so every row gets a deterministic decision (an unguarded
    * null key nulls the predicate and where() silently drops the row
    * even at fraction 1.0). The external SQL oracles mirror this exact
    * expression (q_sample_stratified, q_shuffle_shards, q_split_groups,
    * q_domain_mix, q_token_budget) — any change here must change them
    * all, which is why the spelling lives in exactly one place. */
  private def saltedHash(prefix: String, key: Column): Column =
    HashFunctions.hash60(concat(lit(prefix),
      coalesce(key.cast("string"), lit("<graft-null-key>"))))

  /** Membership predicate: keep the row iff
    * hash60("sample:<salt>:" || key) mod 1e6 < fraction·1e6. */
  def keep(key: Column, fraction: Double, salt: String = ""): Column =
    saltedHash(s"sample:$salt:", key) % 1000000L < lit(ppm(fraction))

  /** Uniform deterministic sample by key. */
  def byKey(df: DataFrame, keyCol: String, fraction: Double,
            salt: String = ""): DataFrame =
    df.where(keep(col(keyCol), fraction, salt))

  /** Stratified deterministic sample: a per-stratum fraction (e.g.
    * downsample dominant languages, keep all of rare ones). Strata not
    * in `rates` use `defaultFraction`. One narrow filter — no shuffle,
    * no count pass; rates are exact in expectation per stratum and
    * reproducible row-for-row. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double], defaultFraction: Double = 1.0,
                 salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit(ppm(defaultFraction))) {
      case (acc, (stratum, fraction)) =>
        when(col(strataCol) === stratum, lit(ppm(fraction))).otherwise(acc)
    }
    df.where(saltedHash(s"sample:$salt:", col(keyCol)) % 1000000L < threshold)
  }

  /** Per-domain TOKEN-BUDGET sampling: keep each domain's documents in
    * a seeded-hash order until the domain's running token total reaches
    * `budget` — "give me ~N training tokens per language/source", the
    * budget-driven complement to [[epochMix]]'s ratio-driven mixing.
    * A document that would cross the budget is excluded (totals
    * under-fill by at most one document).
    *
    * Deterministic: the fill order is hash60(seed, id) with an id
    * tie-break, and the cumulative sum runs over exact longs in that
    * unique order — membership is a pure function of (seed, corpus),
    * independent of partitioning or engine.
    *
    * Scale shape: one window (hash-shuffle by domain) with a running
    * ROWS frame — per-domain state is one long. Skewed domain sizes are
    * window skew; split hot domains upstream if one domain dominates
    * the corpus. */
  def tokenBudget(df: DataFrame, idCol: String, domainCol: String,
                  tokenCol: String, budget: Long,
                  seed: String = ""): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      // NULL ids coalesce so the hash stays defined; ids are expected
      // unique (rows sharing an id — e.g. several nulls — share a hash
      // and tie, and the boundary row among EXACT ties is
      // engine-arbitrary, as for any non-unique id).
      .orderBy(saltedHash(s"budget:$seed:", col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // NULL/negative counts clamp to 0 inside the running sum (size()
    // of a null array is -1 under Spark's legacy default — unguarded,
    // one such row would make the cumulative sum dip back under budget
    // and break the monotone-prefix guarantee).
    val cum = "__graft_token_budget_cum"
    require(!graft.Cols.has(df, cum),
      s"tokenBudget uses internal column `$cum` — the input already has a " +
        "column of that name; rename it first")
    df.withColumn(cum,
        sum(greatest(col(tokenCol).cast("long"), lit(0L))).over(w))
      .where(col(cum) <= budget)
      .drop(cum)
  }

  /** Per-key cap: keep at most `cap` rows per key group, chosen by an
    * explicit priority order — the per-DOMAIN cap of web-corpus
    * curation (RefinedWeb, Penedo et al. 2023 §3.3, caps documents per
    * registered domain so no host dominates the corpus; C4 applies the
    * same idea per URL). Appends a 1-based `rankCol` (priority position
    * within the key group).
    *
    * Scale shape: exact grouped top-k via the bounded-heap partial
    * aggregate ([[graft.functions.BoundedTopKAgg]]) — each task reduces
    * to at most `cap` candidates per key BEFORE the exchange, so the
    * shuffle carries partitions × keys × cap rows and a hot domain with
    * millions of pages costs its map-side heaps, never a corpus-sized
    * window sort (`row_number() OVER (PARTITION BY domain)` would
    * shuffle every row of every hot domain to one reducer each — the
    * skewed-key failure mode this op exists to avoid).
    *
    * `priority` follows the [[graft.functions.VectorFunctions.topKStructs]]
    * ordering contract: ascending lexicographic; encode DESCENDING
    * fields by negation and include a tie-break making the order total
    * (else the boundary row is nondeterministic).
    *
    * Hash mode is the SHIPPED DEFAULT: the aggregate executes under
    * ObjectHashAggregateExec, which silently degrades to SORT-based
    * aggregation once a task's hash map passes
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128 keys) — 3× slower at high key cardinality (measured
    * at 200M rows / ~1000 keys: SkewBench's hot-key table, BENCH_NOTES
    * round-9). Because per-key state is bounded at `cap` rows, raising
    * the threshold is memory-safe by construction, so capPerKey applies
    * it ITSELF, scoped to this plan's execution via
    * [[graft.functions.VectorFunctions.withBoundedTopKConf]] — the
    * caller's session conf is untouched. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], cap: Int,
                priority: Seq[Column], rankCol: String = "rank"): DataFrame =
    graft.functions.VectorFunctions.withBoundedTopKConf(
      capPerKeyPlan(df, keyCols, cap, priority, rankCol))

  /** The raw [[capPerKey]] plan WITHOUT the scoped hash-mode conf —
    * runs at whatever fallback threshold the caller's session has (the
    * stock 128 = sort mode past 128 keys/task). Exists so SkewBench can
    * clock the sort-fallback shape against the shipped default; library
    * callers want [[capPerKey]]. */
  private[graft] def capPerKeyPlan(df: DataFrame, keyCols: Seq[String], cap: Int,
                                   priority: Seq[Column], rankCol: String = "rank"): DataFrame = {
    require(keyCols.nonEmpty, "capPerKey needs at least one key column")
    require(cap > 0, "cap must be positive")
    require(priority.nonEmpty, "capPerKey needs a priority order")
    require(!graft.Cols.has(df, rankCol),
      s"capPerKey writes `$rankCol` — the input already has a column of that " +
        "name (as the session resolver matches it); pass a different rankCol " +
        "or rename the input column")
    val ordNamed = priority.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    // Struct materialized in a codegen'd Project BEFORE the aggregate
    // (same shape as topKBatch): the agg child evals to an UnsafeRow
    // view, no interpreted struct construction per row.
    df.withColumn("__cand", struct(ordNamed :+ payload.as("__row"): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.VectorFunctions.topKStructs(
        col("__cand"), cap, ordNamed.size).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("__e.__row.*") +:
        Seq((col("__pos") + 1).cast("long").as(rankCol)): _*)
  }

  /** Deterministic global shuffle into training shards: every row gets
    * a sha-derived sort key, a shard id (key mod nShards), and its
    * 1-based position within the shard under (sort key, row key) order.
    * The permutation depends only on (seed, row key) — NOT on
    * partitioning, cluster size, or engine — so a re-run (or an
    * external engine, see q_shuffle_shards's oracle) reproduces the
    * exact same training order. This is the "global shuffle" step of a
    * training-data pipeline done Spark-shaped: one hash-shuffle by
    * shard + an in-shard sort, never a single global ORDER BY (shards
    * are written/consumed independently; nShards sets write
    * parallelism at 100 TB). */
  /** `tieCols` orders rows that share the same shuffle key (e.g. the
    * chunks of one packed sequence when `keyCol` is the sequence id):
    * same-key rows stay CONTIGUOUS in their shard — the hash decides
    * where the group goes and groups interleave pseudo-randomly, while
    * tieCols fixes the in-group order. With a unique keyCol, leave it
    * empty. The internal sort key is dropped from the output. */
  def seededShuffle(df: DataFrame, keyCol: String, nShards: Int,
                    seed: String = "", tieCols: Seq[String] = Nil): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    // NULL keys coalesce like every sampler here: unguarded, concat
    // goes null -> null shard (lands in __HIVE_DEFAULT_PARTITION__ on a
    // partitioned write) and null sort keys make shard_pos run-varying.
    val sortKey = saltedHash(s"shuffle:$seed:", col(keyCol))
    require(!graft.Cols.has(df, "shard") && !graft.Cols.has(df, "shard_pos"),
      "seededShuffle writes `shard`/`shard_pos` — the input already has a column " +
        "of that name and withColumn would silently replace it; rename it first")
    // The sort key lives under the repo's __-prefixed internal-name
    // convention (like streamDedup's __graft_dedup_key): a user column
    // named `shuffle_key` used to be silently overwritten and dropped.
    require(!graft.Cols.has(df, "__shuffle_key"),
      "seededShuffle uses internal column `__shuffle_key` — the input already " +
        "has a column of that name; rename it first")
    val withShard = df
      .withColumn("__shuffle_key", sortKey)
      .withColumn("shard", (col("__shuffle_key") % nShards).cast("int"))
    withShard.withColumn("shard_pos",
      row_number().over(Window.partitionBy("shard")
        .orderBy(col("__shuffle_key") +: col(keyCol) +: tieCols.map(col): _*))
        .cast("long"))
      .drop("__shuffle_key")
  }

  /** Deterministic domain mixing by repetition factor: each stratum
    * (domain/language/source) gets a weight w — rows are repeated
    * floor(w) times, plus one more copy with probability frac(w),
    * decided by the row-key hash (so membership of the fractional
    * epoch is reproducible and partition-independent; weight 0.25 =
    * subsample to a quarter, 2.5 = 2 epochs plus a fractional third).
    * This is the "epochs per dataset" knob of LLM data curricula
    * (e.g. differing per-domain epoch counts in Llama/GPT data
    * recipes) as one narrow explode — no shuffle.
    *
    * Output repeats input rows with `copy_id` in [0, copies); rows
    * whose stratum weight rounds to zero copies disappear (explode of
    * an empty sequence drops the row). */
  def epochMix(df: DataFrame, keyCol: String, strataCol: String,
               weights: Map[String, Double], defaultWeight: Double = 1.0,
               salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 100.0),
      "weights must be in [0, 100]")
    val weightExpr = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === stratum, lit(w)).otherwise(acc)
    }
    val whole = floor(weightExpr).cast("long")
    val fracPpm = round((weightExpr - floor(weightExpr)) * 1000000.0).cast("long")
    val extra = when(
      saltedHash(s"mix:$salt:", col(keyCol)) % 1000000L < fracPpm,
      1L).otherwise(0L)
    val copies = (whole + extra).cast("int")
    require(!graft.Cols.has(df, "copy_id"),
      "epochMix writes `copy_id` — the input already has a column of that name " +
        "(a second mixing pass?) and withColumn would silently replace it; rename it first")
    df.withColumn("copy_id",
      explode(when(copies >= 1, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic negative sampling for contrastive/embedding
    * training: k pseudo-random partner ids per anchor, a pure function
    * of (seed, anchor id, draw index) — reproducible across runs,
    * engines, and partitionings, like every sampler here. Requires
    * DENSE ids 0..n-1 (the document store's id model): draw j for
    * anchor a is hash60("neg:seed:a:j") mod n, bumped by one (mod n)
    * when it lands on the anchor itself. Draws are with replacement
    * across j — the standard in-batch/random-negatives regime.
    *
    * Scale shape: one narrow explode (k rows per anchor), then — only
    * if `partnerCols` are requested — ONE equi-join on the partner id
    * to fetch them (hash shuffle, ships just the id pairs plus the
    * selected columns; never a cartesian).
    *
    * COST NOTE: when `total` is None this runs an EAGER `df.count()` at
    * call time (the modulus must be the exact corpus size), and the
    * input lineage is then re-read for the anchors and — with
    * partnerCols — a third time for the partner join. Pass `total` when
    * the count is already known, and persist an expensive input first
    * (same guidance as [[Dsir.selectTopK]]). */
  def negativePairs(df: DataFrame, idCol: String, k: Int, seed: String = "",
                    partnerCols: Seq[String] = Nil,
                    total: Option[Long] = None): DataFrame = {
    require(k > 0, "k must be positive")
    val n = total.getOrElse(df.count())
    require(n > 1, "negative sampling needs at least 2 rows")
    val raw = HashFunctions.hash60(concat(lit(s"neg:$seed:"),
      col("anchor_id").cast("string"), lit(":"), col("j").cast("string"))) % n
    val pairs = df.select(col(idCol).as("anchor_id"))
      .select(col("anchor_id"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("j"))
      .withColumn("__raw", raw)
      .withColumn("neg_id",
        when(col("__raw") === col("anchor_id"), (col("__raw") + 1L) % n)
          .otherwise(col("__raw")))
      .drop("__raw")
    if (partnerCols.isEmpty) pairs
    else pairs.join(
        df.select(col(idCol).as("neg_id") +:
          partnerCols.map(c => col(c).as(s"neg_$c")): _*),
        Seq("neg_id"))
      .select(col("anchor_id") +: col("j") +: col("neg_id") +:
        partnerCols.map(c => col(s"neg_$c")): _*)
  }

  /** Leakage-safe train/valid/test split: the split is decided by a
    * deterministic hash of a GROUP key (domain, canonical URL, dup-family
    * component...), so every row of a group lands in the same split and
    * near-duplicates can never straddle train and eval — splitting i.i.d.
    * by row is the classic contamination bug this op exists to prevent.
    *
    * `fractions` are (name, fraction) in priority order and must sum to
    * 1; the group hash lands in cumulative ppm intervals
    * [0, f1), [f1, f1+f2), ... Deterministic and engine-reproducible
    * (hash60, same as the sampling family) — re-running on a grown
    * corpus keeps every already-seen group in its old split.
    *
    * Scale shape: a single narrow projection — no shuffle, no join, no
    * group materialization; the "grouping" exists only inside the hash.
    */
  def splitByGroup(df: DataFrame, groupCol: String,
                   fractions: Seq[(String, Double)],
                   salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val h = saltedHash(s"split:$salt:", col(groupCol)) % 1000000L
    require(!graft.Cols.has(df, "split"),
      "splitByGroup writes `split` — the input already has a column of that " +
        "name and withColumn would silently replace it; rename it first")
    val bounds = fractions.map(_._2).scanLeft(0L)((acc, f) => acc + ppm(f))
    // last bound may land at 999999 < hash max from fp rounding; the
    // final otherwise() absorbs the remainder into the last split.
    val split = fractions.init.zipWithIndex.foldRight(
      lit(fractions.last._1): Column) { case (((name, _), i), rest) =>
        when(h < lit(bounds(i + 1)), lit(name)).otherwise(rest)
    }
    df.withColumn("split", split)
  }
}
