package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.IvfIndex

/** Cluster-pruned semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means-partition the embedding space, then look
  * for near-duplicate pairs ONLY within each cluster. The reference
  * engine has no semantic dedup; this extends its exact/MinHash/SimHash
  * family (index.py:202-218 is the exact tier) with the embedding tier
  * modern training-data pipelines run at corpus scale.
  *
  * Scale shape: the clustering IS the candidate generator. Cluster
  * assignment is a narrow per-row argmin over the (tiny, broadcast)
  * centroid table; the pair search is an equi-join on the cluster key,
  * so candidate pairs are Σ_c (n_c choose 2), never (n choose 2) — with
  * nlist ≈ √n clusters the expected pair count is O(n^1.5), and the
  * join shuffles each side once on the cluster key. No all-pairs
  * anywhere; a skewed (over-full) cluster degrades gracefully into a
  * bigger local pair block, and the fix at 100 TB is more clusters, not
  * a different algorithm.
  *
  * That nlist ∝ √n rule is MEASURED, not advisory (r15 ScaleBench
  * decade check): holding nlist=8 fixed while the corpus grew ×100
  * (200k vectors) put the within-cluster pair join at 544.8 s — the
  * quadratic n_c growth exactly as the formula predicts — while
  * √-scaling to nlist=80 on the same corpus ran flag() in 2.1 s
  * (+6.4 s fit). And since r16 it is AUTOMATED: fit the coarse
  * quantizer with `nlist = 0` ([[IvfIndex.fit]]/[[IvfIndex.fitCached]])
  * and the cluster count derives from the data via
  * [[IvfIndex.autoNlist]] (`max(8, round(√(n/30)))`) — the scale-safe
  * configuration is the default, and a pinned explicit nlist remains
  * an opt-in for callers replaying a fixed fit (the oracle-pinned
  * bench queries do exactly that). Numbers in BENCH_NOTES "Round 15".
  *
  * Determinism contract (the oracle gate's requirements): cluster
  * assignment uses the model's rounded-distance argmin with
  * lowest-index tie-break ([[IvfIndex.Model.assignCol]]); cosine is
  * rounded HALF_UP to `roundScale` BEFORE the threshold compare; the
  * keep/drop decision depends only on (id order, rounded cosine), so
  * any engine starting from the same pinned centroids reproduces it
  * bit-for-bit.
  */
object SemDedup {

  /** Within-cluster near-duplicate pairs: (cluster, id_a, id_b, cosine)
    * with id_a < id_b and rounded cosine >= threshold. The SemDeDup
    * candidate set — pairs in DIFFERENT clusters are never examined
    * (that miss rate is the algorithm's documented recall trade; tune
    * with fewer clusters, not all-pairs).
    *
    * @param int8Screen route the pair join through the lossless
    *   quantized pre-filter (default on; see [[pairsFrom]]). Results
    *   are identical either way — the flag exists for A/B measurement.
    * @param nProbes multi-probe membership (default 1 = classic
    *   SemDeDup): each vector joins the pair search under its nProbes
    *   nearest clusters, so a near-dup pair straddling a cluster
    *   boundary meets in at least one shared probe — closing the
    *   documented cross-cluster miss at ~nProbes× the candidate
    *   volume (still Σ_c (n_c choose 2), never all-pairs). Pairs
    *   found under several shared probes are deduplicated to the
    *   meeting with the lowest combined probe rank (home cluster when
    *   they meet primary-primary; ties to the smallest cluster id),
    *   so the output stays one row per pair. */
  def pairs(df: DataFrame, idCol: String, vecCol: String,
            model: IvfIndex.Model, threshold: Double,
            roundScale: Int = 4, int8Screen: Boolean = true,
            nProbes: Int = 1): DataFrame =
    pairsFrom(assign(df, idCol, vecCol, model, roundScale, nProbes),
      threshold, roundScale, int8Screen, dedupPairs = nProbes > 1)

  /** Per-row keep/drop verdict: every input row (with a non-null
    * vector) with its cluster, an `is_dup` flag, and `dup_of` = the
    * LOWEST id it duplicates within its cluster (null when kept).
    * "Keep the first occurrence" by id — the same survivor rule as the
    * exact-dedup tier, so a pipeline can `where(not(is_dup))` and get
    * a deterministic corpus. The assignment kernel (the dominant
    * narrow map at scale: corpus scan × argmin over all centroids)
    * runs ONCE — both pair-join sides and the output derive from the
    * same assigned frame. */
  def flag(df: DataFrame, idCol: String, vecCol: String,
           model: IvfIndex.Model, threshold: Double,
           roundScale: Int = 4, int8Screen: Boolean = true,
           nProbes: Int = 1): DataFrame = {
    val assigned = assign(df, idCol, vecCol, model, roundScale, nProbes)
    val dupOf = pairsFrom(assigned, threshold, roundScale, int8Screen,
        dedupPairs = nProbes > 1)
      .groupBy(col("id_b").as("id")).agg(min("id_a").as("dup_of"))
    // Output identity rows come from the PRIMARY assignment only —
    // multi-probe rows exist for candidate generation, not identity.
    assigned.where(col("probe_rank") === 0).select(col("id"), col("cluster"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("dup_of").isNotNull.cast("int").as("is_dup"), col("dup_of"))
  }

  /** The within-cluster pair search over an assigned frame.
    *
    * With `int8Screen` on (the 100 TB path), the cluster-key shuffle
    * ships an int8-quantized vector (1 byte/dim vs 8) plus three
    * scalars per side; candidate pairs are screened on a PROVABLY
    * SAFE upper bound of their cosine, and only survivors fetch the
    * full double vectors (two id equi-joins — identical subtrees, so
    * the exchange is reused — with AQE runtime filters pruning the
    * vector scans to candidate ids) for the exact rounded cosine.
    * ~8× fewer candidate-shuffle bytes at corpus scale, bit-identical
    * output.
    *
    * Why the screen is lossless: with ua = maxAbs(a)/127, each element
    * is a_i = qa_i·ua + e_i with |e_i| <= ua/2 (round to nearest), so
    *   |dot(a,b) − ua·ub·dotq| <= ua·ub·(Σ|qa|/2 + Σ|qb|/2 + d/4)
    * and dividing by the EXACT norms gives a hard upper bound on
    * cosine(a,b). A pair is screened out only when that bound (plus a
    * 1e-9 slack absorbing the bound arithmetic's own float error —
    * cosines live in [-1,1], so absolute slack is meaningful) sits
    * below threshold − 0.5·10^-roundScale, i.e. when even rounding
    * HALF_UP could not lift the true cosine to the threshold. NaN
    * bounds (zero-norm vectors) are never screened out — Spark orders
    * NaN above every double, which here errs on the keep side. */
  private def pairsFrom(assigned: DataFrame, threshold: Double,
                        roundScale: Int, int8Screen: Boolean = true,
                        dedupPairs: Boolean = false): DataFrame = {
    // Multi-probe dedup: a pair sharing BOTH probes surfaces once per
    // shared cluster — collapse to the meeting with the LOWEST combined
    // probe rank (so a pair that meets primary-primary is reported
    // under its home cluster), ties to the smallest cluster id. The
    // rounded cosine is identical across copies, so min() is exact.
    def dedup(p: DataFrame): DataFrame =
      if (!dedupPairs) p.select("cluster", "id_a", "id_b", "cosine")
      else p.groupBy("id_a", "id_b")
        .agg(min(struct(col("__rsum"), col("cluster"))).as("__m"),
          min("cosine").as("cosine"))
        .select(col("__m.cluster").as("cluster"), col("id_a"), col("id_b"),
          col("cosine"))
    if (!int8Screen) {
      val a = assigned.select(col("cluster"), col("id").as("id_a"),
        col("v").as("v_a"), col("probe_rank").as("__ra"))
      val b = assigned.select(col("cluster"), col("id").as("id_b"),
        col("v").as("v_b"), col("probe_rank").as("__rb"))
      return dedup(a.join(b, Seq("cluster"))
        .where(col("id_a") < col("id_b"))
        .withColumn("cosine",
          round(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")), roundScale))
        .where(col("cosine") >= threshold)
        .select(col("cluster"), col("id_a"), col("id_b"), col("cosine"),
          (col("__ra") + col("__rb")).as("__rsum")))
    }
    // Per-row compact representation: int8 vector, quantization step,
    // exact L2 norm, Σ|q| (all narrow, computed once per row; the
    // lambdas reference only materialized attributes). Shared with the
    // streaming semantic gate via [[withInt8]].
    val quant = withInt8(
        assigned.select(col("cluster"), col("probe_rank"), col("id"), col("v")),
        "v")
      .select(col("cluster"), col("probe_rank"), col("id"),
        col("__q").as("q"), col("__ua").as("ua"),
        col("__nrm").as("nrm"), col("__sq").as("sq"))
    val a = quant.select(col("cluster"), col("id").as("id_a"), col("q").as("q_a"),
      col("ua").as("ua_a"), col("nrm").as("n_a"), col("sq").as("sq_a"),
      col("probe_rank").as("__ra"))
    val b = quant.select(col("cluster"), col("id").as("id_b"), col("q").as("q_b"),
      col("ua").as("ua_b"), col("nrm").as("n_b"), col("sq").as("sq_b"),
      col("probe_rank").as("__rb"))
    val cand = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .where(int8SurvivePredicate(
        col("q_a"), col("ua_a"), col("n_a"), col("sq_a"),
        col("q_b"), col("ua_b"), col("n_b"), col("sq_b"),
        threshold, roundScale))
      .select(col("cluster"), col("id_a"), col("id_b"),
        (col("__ra") + col("__rb")).as("__rsum"))
    // Multi-probe: collapse duplicate candidates BEFORE the exact
    // verify so a boundary pair is re-scored once, not per shared
    // probe — keeping the meeting with the lowest combined probe rank
    // (home cluster for pairs that meet primary-primary), ties to the
    // smallest cluster id.
    val candDeduped =
      if (dedupPairs) cand.groupBy("id_a", "id_b")
        .agg(min(struct(col("__rsum"), col("cluster"))).as("__m"))
        .select(col("__m.cluster").as("cluster"), col("id_a"), col("id_b"))
      else cand.select("cluster", "id_a", "id_b")
    // Vector fetch joins use the PRIMARY rows only — under multi-probe
    // `assigned` holds one row per (id, probe) and an unfiltered join
    // would multiply every candidate by nProbes².
    val primary = assigned.where(col("probe_rank") === 0)
    val va = primary.select(col("id").as("id_a"), col("v").as("v_a"))
    val vb = primary.select(col("id").as("id_b"), col("v").as("v_b"))
    candDeduped.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")), roundScale))
      .where(col("cosine") >= threshold)
      .select("cluster", "id_a", "id_b", "cosine")
  }

  /** Append the int8-screen representation for a double-vector column:
    * `__q` (int8-quantized vector), `__ua` (quantization step), `__nrm`
    * (exact L2 norm), `__sq` (Σ|q|) — the compact pair-shuffle payload
    * shared by [[pairsFrom]] and the streaming semantic gate
    * ([[graft.streaming.StreamingOps.semNearDupScreenBatch]]): 1 byte
    * per dim plus three scalars instead of 8 bytes per dim. All narrow,
    * computed once per row. */
  private[graft] def withInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.withColumn("__m", VectorFunctions.maxAbs(v))
      .withColumn("__q",
        when(col("__m") === 0.0, transform(v, _ => lit(0).cast("byte")))
          .otherwise(transform(v,
            x => round((x * 127.0) / col("__m")).cast("byte"))))
      .withColumn("__ua", col("__m") / 127.0)
      .withColumn("__nrm", VectorFunctions.l2Norm(v))
      .withColumn("__sq", aggregate(col("__q"),
        lit(0L), (acc, x) => acc + abs(x.cast("long"))).cast("double"))
      .drop("__m")
  }

  /** The PROVABLY SAFE int8 screen predicate (see [[pairsFrom]]'s
    * scaladoc for the bound derivation): true = the pair may still
    * reach `threshold` after rounding and must go to the exact rerank;
    * false = even rounding HALF_UP could not lift the true cosine to
    * the threshold, so the pair is screened out losslessly. A zero-norm
    * side makes the bound NULL (try_divide — plain `/` would raise
    * under ANSI) and a NaN numerator keeps it NaN; neither may be
    * screened out, so survival is NOT(upper < cutoff) with the null
    * branch coalesced to keep. Shared by [[pairsFrom]] and the
    * streaming semantic gate. */
  private[graft] def int8SurvivePredicate(
      qa: Column, uaA: Column, nrmA: Column, sqA: Column,
      qb: Column, uaB: Column, nrmB: Column, sqB: Column,
      threshold: Double, roundScale: Int): Column = {
    val cutoff = threshold - 0.5 * math.pow(10.0, -roundScale) - 1e-9
    val dotq = VectorFunctions.dotProductInt8(qa, qb).cast("double")
    val upper = try_divide(
      uaA * uaB * (dotq + lit(0.5) * (sqA + sqB) +
        lit(0.25) * size(qa).cast("double")),
      nrmA * nrmB)
    coalesce(!(upper < lit(cutoff)), lit(true))
  }

  /** Null vectors are EXCLUDED here, not silently mis-clustered: a null
    * embedding has no meaningful cluster (the argmin expression yields
    * null) and could never pair anyway, but left in it would surface as
    * a null-keyed row the equi-join silently drops from one path and
    * not the other. Callers route undecodable rows separately.
    *
    * Ids: a NON-NULL id that fails the long cast raises instead of
    * becoming a null that can never pair (silent duplicate
    * under-reporting — the same try_cast + raise_error screen as
    * [[Packing.packSequences]]). A genuinely null id passes through:
    * the row is kept and never flagged, since there is no identity to
    * dedup against. */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     model: IvfIndex.Model, roundScale: Int,
                     nProbes: Int = 1): DataFrame = {
    val idLong = col(idCol).try_cast("long")
    val base = df.where(col(vecCol).isNotNull)
      .select(when(col(idCol).isNotNull && idLong.isNull,
          raise_error(concat(
            lit(s"SemDedup: id in '$idCol' is not castable to long: "),
            col(idCol).cast("string")))).otherwise(idLong).as("id"),
        col(vecCol).cast("array<double>").as("v"))
    if (nProbes <= 1)
      // Single-probe: the fused kernel (the hot narrow map at scale).
      base.withColumn("cluster", model.assignCol(col("v"), roundScale))
        .withColumn("probe_rank", lit(0))
    else
      // Multi-probe: one row per (id, probe), rank 0 = the primary
      // assignment (element 0 equals assignCol — IvfIndexSpec pin).
      base.select(col("id"), col("v"),
        posexplode(model.assignProbesCol(col("v"), nProbes, roundScale))
          .as(Seq("probe_rank", "cluster")))
  }
}
