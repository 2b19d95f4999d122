package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.functions.TextFunctions.tokens

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed-n-gram bag is under a target-domain LM than under the raw
  * corpus LM, then keep the top-weighted documents. This is the
  * "select pretraining data that looks like the target domain" step of
  * a modern pipeline — the reference engine has nothing like it, but a
  * 100 TB curation run is exactly where it pays.
  *
  * Model (paper §3, hashed generative importance weights): features are
  * word bigrams hashed into `buckets` buckets; both corpora get a
  * unigram-of-buckets LM with add-one smoothing over the bucket space,
  * and a document's log-weight is
  *   Σ_g [ ln (tcnt(g)+1)/(T+B)  −  ln (rcnt(g)+1)/(R+B) ]
  * over its bigram OCCURRENCES g (T/R = total target/raw bigram mass,
  * B = bucket count).
  *
  * Scale shape: TWO evaluations of the raw corpus's tokenize+explode
  * lineage (the per-bucket count collect, then the scoring pass) and
  * one over the (smaller) target corpus, each aggregated by bucket
  * with map-side combine — persist the raw corpus (or its bucketed
  * projection) upstream if tokenization is the dominant cost; the
  * exploded bigram stream itself is deliberately NOT cached here (it
  * is bigger than the corpus). The per-bucket log-ratio table has AT
  * MOST `buckets` rows —
  * fixed by config, independent of corpus size — so the scoring join is
  * a broadcast hash join against the corpus bigram stream: the whole
  * operator is two aggregations plus one broadcast-joined pass, no
  * corpus-sized shuffle on the scoring side. (The bucket table is
  * hash-dense by construction; 4k-1M buckets ≪ any broadcast limit.)
  *
  * Determinism contract: bucket ids are sha-derived
  * ([[HashFunctions.hash60]] mod B — engine/partition independent);
  * each bucket's log-ratio is rounded HALF_UP to `logScale` dp; the
  * per-doc sum runs through exact DECIMAL(18,logScale) so addition
  * order can't matter; the final weight rounds to `outScale` dp BEFORE
  * any ranking, and selection ties break by id. Bit-identical across
  * engines given the same tokenization (single-space split). */
object Dsir {

  /** Per-document importance log-weights of `raw` against `target`.
    * Output: (idCol, n_bigrams, logweight) — one row per raw document
    * with >= 2 tokens (no bigrams → no evidence → no row, same rule as
    * [[TextAnalysis.bigramSurprisal]]). `target` is typically a small
    * in-domain sample; it only contributes counts, so it needs no id
    * column and may overlap `raw`. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 4096, logScale: Int = 6,
                        outScale: Int = 4): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Null-id docs are unattributable: the scoring groupBy would MERGE
    // them all into one bogus row whose inflated weight could win a
    // selectTopK slot from a real document — drop them, the same
    // conservative direction decontaminate takes (they also stay out
    // of the raw LM counts: both sides of the ratio see one corpus).
    val docBuckets = bucketed(
      raw.where(col(idCol).isNotNull)
        .select(col(idCol).as("id"), col(textCol).as("txt")), buckets)
    // Both count tables have AT MOST `buckets` rows — fixed by config,
    // independent of corpus size — so the per-bucket log-ratio table is
    // computed ON THE DRIVER from two bounded collects (the same
    // driver-side discipline as the PQ ADC table): one parallel
    // explode+agg pass per corpus, then pure scalar arithmetic. The
    // previous all-in-plan form re-evaluated the raw bigram aggregate
    // under two separate broadcast exchanges (totals + ratio), costing
    // a serialized job chain and one extra corpus-sized explode.
    val rawCnt: Map[Long, Long] = docBuckets
      .groupBy("bkt").agg(count(lit(1)).as("rcnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtCnt: Map[Long, Long] = bucketed(
      target.select(lit(0L).as("id"), col(textCol).as("txt")), buckets)
      .groupBy("bkt").agg(count(lit(1)).as("tcnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A target with NO bigrams (empty frame, or every doc < 2 tokens)
    // carries no evidence — fail loud instead of returning a
    // meaningless all-null scoring (same screen discipline as
    // [[Packing.packSequences]]'s id cast).
    require(tgtCnt.nonEmpty,
      "importanceWeights: target contributed no bigrams " +
      "(empty target, or every target doc has < 2 tokens)")
    val rtot = rawCnt.values.sum.toDouble
    val ttot = tgtCnt.values.sum.toDouble
    // Bit-parity with the former in-plan expression: Catalyst's LOG is
    // StrictMath.log and round(_, n) on a double goes through
    // BigDecimal.valueOf + HALF_UP — replicate both exactly.
    def roundN(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(logScale, java.math.RoundingMode.HALF_UP).doubleValue
    // Ratio over buckets PRESENT IN RAW (a scored doc's buckets are raw
    // buckets by construction); target-absent buckets smooth to tcnt=0.
    val ratioRows = rawCnt.toSeq.sortBy(_._1).map { case (bkt, rcnt) =>
      (bkt, roundN(
        StrictMath.log((tgtCnt.getOrElse(bkt, 0L) + 1.0) / (ttot + buckets.toDouble)) -
        StrictMath.log((rcnt + 1.0) / (rtot + buckets.toDouble))))
    }
    val sq = raw.sparkSession
    import sq.implicits._
    val ratio = ratioRows.toDF("bkt", "logr")
    docBuckets.join(broadcast(ratio), "bkt")
      .groupBy("id")
      // Round the exact DECIMAL sum FIRST, cast after: rounding through
      // an intermediate double can flip a x.xxx05 boundary (the nearest
      // double may sit just below it) and diverge between engines.
      .agg(count(lit(1)).cast("long").as("__cnt"),
        max(col("nbg")).as("__nbg"),
        round(sum(col("logr").cast(s"decimal(18,$logScale)")), outScale)
          .cast("double").as("logweight"))
      .select(col("id").as(idCol),
        // Duplicate raw ids MERGE in this groupBy (two docs' evidence
        // summed under one id — silently wrong selection): with unique
        // ids the group's row count equals its bigram count exactly
        // (see bucketed), so any mismatch is a duplicate — raise.
        when(col("__cnt") =!= col("__nbg"), raise_error(concat(
            lit("importanceWeights: duplicate id in raw — weights " +
              "would merge two documents' evidence: "),
            col("id").cast("string"))))
          .otherwise(col("__cnt")).as("n_bigrams"),
        col("logweight"))
  }

  /** Deterministic top-k selection over [[importanceWeights]] output:
    * adds `selected` = 1 for the k highest-weight documents (weight
    * already rounded, ties by ascending id — round-before-rank).
    *
    * Scale shape — NO global window: DSIR selection runs over the full
    * raw corpus by definition (paper §3), so an unpartitioned
    * `row_number` would serialize one row per document onto a single
    * reducer. Instead the k-th row of the (logweight desc, id asc)
    * total order is found with `orderBy(...).limit(k)` — which plans as
    * `TakeOrderedAndProject`: a per-partition bounded heap merging
    * numPartitions × k rows on the driver, no corpus shuffle at all —
    * re-sorted the opposite way and cut to 1 row (the boundary). The
    * flag is then a pure broadcast-scalar comparison: strictly higher
    * weight selects, equal weight selects iff id <= the boundary id.
    * Exact and bit-identical to the old rank semantics (the order is
    * total, so the k-th row is unique); when the corpus has fewer than
    * k rows the boundary is the globally last row and every row
    * selects. Cost: the weights lineage evaluates twice (once pruned to
    * two columns for the boundary, once for the output) — at corpus
    * scale two narrow passes beat one single-reducer sort; persist
    * `weights` first if recompute is expensive. */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // NULLS LAST in BOTH passes: desc defaults to nulls-last but asc
    // defaults to nulls-FIRST, so with k >= the non-null row count a
    // null logweight row would enter the k-set and then WIN the
    // boundary cut — a null boundary nulls every comparison and
    // selects ZERO rows. With nulls pushed last, the boundary is the
    // worst NON-null weight in the k-set (null-weight rows can never
    // select anyway — the coalesce below flags them 0).
    val boundary = weights
      .select(col("logweight").as("__bw"), col(idCol).as("__bid"))
      .orderBy(col("__bw").desc_nulls_last, col("__bid").asc).limit(k)
      .orderBy(col("__bw").asc_nulls_last, col("__bid").desc).limit(1)
    weights.crossJoin(broadcast(boundary))
      .withColumn("selected",
        coalesce(col("logweight") > col("__bw") ||
          (col("logweight") === col("__bw") && col(idCol) <= col("__bid")),
          lit(false)).cast("int"))
      .drop("__bw", "__bid")
  }

  /** Inference half, decoupled from ratio training: score documents
    * against a GIVEN (bkt, weight) table — e.g. a linear quality
    * classifier trained offline (the fastText-style educational-value
    * scorers used by FineWeb-Edu-like pipelines reduce to exactly this
    * once their features are hashed n-grams). Same determinism contract
    * as [[importanceWeights]] (weights are expected pre-rounded; the
    * per-doc sum is DECIMAL-exact), same broadcast-joined single-pass
    * shape: the weight table is bounded by the bucket space, the corpus
    * is scanned once. Unmatched buckets contribute 0 (out-of-vocabulary
    * features carry no evidence). */
  def scoreWithWeights(df: DataFrame, idCol: String, textCol: String,
                       weights: DataFrame, buckets: Int = 4096,
                       logScale: Int = 6, outScale: Int = 4): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val w = weights.select(col("bkt"), col("weight"))
    // Fail loud on duplicate buckets (e.g. two trained tables unioned):
    // the left join below would MULTIPLY every occurrence in a
    // duplicated bucket, silently inflating n_bigrams and score. The
    // check is one aggregate over the bucket-bounded table — trivial
    // next to the corpus scan it protects.
    require(w.groupBy("bkt").count().where(col("count") > 1).isEmpty,
      "scoreWithWeights: duplicate bkt entries in the weight table — " +
        "deduplicate (one weight per bucket) before scoring")
    // Same null/duplicate id discipline as importanceWeights: null ids
    // are unattributable (dropped); duplicates would merge two docs'
    // scores — detected for free via the carried bigram count.
    bucketed(df.where(col(idCol).isNotNull)
        .select(col(idCol).as("id"), col(textCol).as("txt")), buckets)
      .join(broadcast(w), Seq("bkt"), "left")
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("__cnt"),
        max(col("nbg")).as("__nbg"),
        round(sum(coalesce(col("weight"), lit(0.0))
          .cast(s"decimal(18,$logScale)")), outScale)
          .cast("double").as("score"))
      .select(col("id").as(idCol),
        when(col("__cnt") =!= col("__nbg"), raise_error(concat(
            lit("scoreWithWeights: duplicate id — scores would merge " +
              "two documents' evidence: "), col("id").cast("string"))))
          .otherwise(col("__cnt")).as("n_bigrams"),
        col("score"))
  }

  /** (id, nbg, bkt) per bigram occurrence: single-space tokenization
    * (the corpus contract shared by all text ops here), sha-derived
    * bucket. `nbg` carries the row's expected bigram count
    * (tokens - 1) so the scoring aggregates can detect a DUPLICATE id
    * for free: with unique ids every group's row count equals its nbg
    * exactly (each occurrence joins once), so count != max(nbg) ⇔ two
    * docs merged under one id — no extra shuffle, unlike a standalone
    * uniqueness aggregate over the corpus. */
  private def bucketed(df: DataFrame, buckets: Int): DataFrame =
    df.select(col("id"), tokens(col("txt")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("id"), (size(col("toks")) - 1).cast("long").as("nbg"),
        explode(QualitySignals.rawBigrams(col("toks"))).as("bg"))
      .select(col("id"), col("nbg"),
        pmod(HashFunctions.hash60(col("bg")), lit(buckets.toLong)).as("bkt"))
}
