package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the harness that makes an approximate
  * index's recall a measured number instead of a hope. The reference has
  * no evaluation surface at all (its IVF quality is whatever FAISS
  * gives, index.py:239-291); at training-pipeline scale, every ANN
  * shortcut (IVF nprobe, PQ, binary prescreen, LSH) should ship with a
  * recall@k measured against the exact scan on a query sample.
  */
object Eval {

  /** Per-query recall@k: |approx ∩ exact| / |exact|, one row per query.
    *
    * Inputs are the two top-k result sets as (queryCol, idCol) rows —
    * any of this library's search paths produce that shape (topK,
    * topKBatch, IvfIndex/PqIndex searches, similaritySearchApprox).
    *
    * Shape: one equi-join on (query, id) + one grouped count — both
    * sides are bounded by queries×k rows, so this costs nothing next to
    * the searches themselves. Output: (queryCol, n_exact, n_overlap,
    * recall) with recall rounded to 4 dp. */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                queryCol: String, idCol: String): DataFrame = {
    // Distinct both sides: a duplicate (query, id) — an id surfaced by
    // two IVF probes or two LSH bands — would fan the join out and
    // inflate n_exact AND n_overlap (recall 0.67 where truth is 0.5).
    val e = exact.select(col(queryCol), col(idCol)).distinct()
    val a = approx.select(col(queryCol), col(idCol)).distinct()
      .withColumn("__hit", lit(1))
    e.join(a, Seq(queryCol, idCol), "left")
      .groupBy(queryCol)
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_overlap"))
      .withColumn("recall",
        round(col("n_overlap").cast("double") / col("n_exact"), 4))
  }

  /** Binary-relevance MRR@k and nDCG@k per query — the other half of
    * retrieval evaluation: [[recallAtK]] asks "did the shortcut find
    * the same set", this asks "did the ranker put the RIGHT things on
    * top" (BM25 vs hybrid vs dense A/B at pipeline scale).
    *
    * `results` holds ranked lists as (queryCol, idCol, rankCol 1-based);
    * `relevant` is the (queryCol, idCol) ground-truth set. Per query:
    * mrr = 1/rank of the first relevant hit in the top k (0 if none);
    * ndcg = DCG@k / IDCG@k with gain 1 for relevant, 0 otherwise, where
    * IDCG@k uses min(|relevant|, k) ideal hits — relevant ids the
    * ranker never surfaced still lower its nDCG.
    *
    * Engine-exact determinism: each 1/log2(rank+1) gain is rounded to
    * 6 dp and summed through exact DECIMAL (the BM25-oracle pattern),
    * so DCG never depends on float fold order; final metrics round to
    * 4 dp. Scale shape: everything is bounded by queries×k result rows
    * plus one count-aggregate over the relevance set — one hash join +
    * two grouped aggregates, nothing corpus-sized. */
  def rankingMetrics(results: DataFrame, relevant: DataFrame,
                     queryCol: String, idCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    def gain(rank: Column): Column =
      round(lit(1.0) / log2(rank.cast("double") + 1.0), 6)
        .cast("decimal(18,6)")
    val rel = relevant.select(col(queryCol), col(idCol)).distinct()
      .withColumn("__rel", lit(1))
    // Dedup (query, id) to its BEST rank before scoring: the same
    // producers recallAtK distincts for (an id surfaced by two IVF
    // probes or two LSH bands) would otherwise count one relevant hit
    // once per surfaced rank in DCG while IDCG caps at distinct hits —
    // a duplicating ranker could score nDCG > 1.0, beating a perfect
    // one. Min-rank keeps MRR's "first hit" semantics unchanged.
    val res = results.select(col(queryCol), col(idCol), col(rankCol))
      .where(col(rankCol) <= k)
      .groupBy(col(queryCol), col(idCol))
      .agg(min(col(rankCol)).as(rankCol))
    val perQuery = res
      .join(rel, Seq(queryCol, idCol), "left")
      .groupBy(queryCol)
      .agg(min(when(col("__rel") === 1, col(rankCol)))
             .cast("long").as("__first"),
        sum(when(col("__rel") === 1, gain(col(rankCol)))).as("__dcg"))
    val nRel = rel.groupBy(queryCol)
      .agg(count(lit(1)).cast("long").as("n_rel"))
    // IDCG over the ideal prefix min(n_rel, k): explode a generated
    // rank sequence (bounded by queries×k rows) and sum the DECIMAL
    // gains through the same grouped aggregate as DCG — exact,
    // order-free addition, no float fold anywhere.
    val idcg = nRel.select(col(queryCol),
        explode(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))))
          .as("__i"))
      .groupBy(queryCol).agg(sum(gain(col("__i"))).as("__idcg"))
    perQuery.join(nRel, Seq(queryCol), "full_outer")
      .join(idcg, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 4).as("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) === 0 || col("__dcg").isNull,
            lit(0.0))
          .otherwise(round(
            col("__dcg").cast("double") / col("__idcg").cast("double"), 4))
          .as("ndcg"))
  }
}
