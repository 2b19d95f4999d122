package graft.ops

import org.apache.spark.sql.DataFrame
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
}
