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
    * with fewer clusters, not all-pairs). */
  def pairs(df: DataFrame, idCol: String, vecCol: String,
            model: IvfIndex.Model, threshold: Double,
            roundScale: Int = 4): DataFrame =
    pairsFrom(assign(df, idCol, vecCol, model, roundScale),
      threshold, roundScale)

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
           roundScale: Int = 4): DataFrame = {
    val assigned = assign(df, idCol, vecCol, model, roundScale)
    val dupOf = pairsFrom(assigned, threshold, roundScale)
      .groupBy(col("id_b").as("id")).agg(min("id_a").as("dup_of"))
    assigned.select(col("id"), col("cluster"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("dup_of").isNotNull.cast("int").as("is_dup"), col("dup_of"))
  }

  private def pairsFrom(assigned: DataFrame, threshold: Double,
                        roundScale: Int): DataFrame = {
    val a = assigned.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")), roundScale))
      .where(col("cosine") >= threshold)
      .select("cluster", "id_a", "id_b", "cosine")
  }

  /** Null vectors are EXCLUDED here, not silently mis-clustered: a null
    * embedding has no meaningful cluster (the argmin expression yields
    * null) and could never pair anyway, but left in it would surface as
    * a null-keyed row the equi-join silently drops from one path and
    * not the other. Callers route undecodable rows separately. */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     model: IvfIndex.Model, roundScale: Int): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("cluster", model.assignCol(col("v"), roundScale))
}
