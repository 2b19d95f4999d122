package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Chunk-embedding -> document-embedding aggregation (mean pooling) —
  * the step that turns a chunked+embedded corpus back into one vector
  * per document for doc-level search/dedup. The reference embeds
  * pre-chunked units only (reference: src/langchain_memvid/
  * encoder.py:180, index.py:188-191 — one vector per ingested chunk);
  * pooling is the pipeline operator that composes with
  * `TextFunctions.chunks`.
  *
  * Exactness: the element-wise sum runs through
  * [[graft.functions.VectorSumFixed6Agg]] (1e-6 fixed point, integer
  * adds) so the pooled vector is independent of partitioning and merge
  * order; the mean divides the micro sums in double and rounds to
  * 6 dp. One hash-shuffle groupBy on the key; map-side partial
  * aggregation applies (buffers are one long[] per group, 8 bytes per
  * dimension).
  */
object Pooling {

  /** Adds per-key: `n_vecs`, `sum_micro` (array<long>, exact), and
    * `outCol` = round(sum_micro / (1e6 * n_vecs), 6) — the mean-pooled
    * vector. */
  def meanPool(df: DataFrame, keyCol: String, vecCol: String,
               outCol: String = "mean_vec"): DataFrame =
    df.groupBy(col(keyCol))
      .agg(VectorFunctions.vecSumMicro(col(vecCol)).as("sum_micro"),
        count(col(vecCol)).as("n_vecs"))
      .withColumn(outCol,
        transform(col("sum_micro"),
          s => round(s.cast("double") / (lit(1e6) * col("n_vecs")), 6)))

  /** Max pooling (element-wise max per key) — the other standard
    * chunk->doc reduction; same exact fixed point, idempotent merges. */
  def maxPool(df: DataFrame, keyCol: String, vecCol: String,
              outCol: String = "max_vec"): DataFrame =
    df.groupBy(col(keyCol))
      .agg(VectorFunctions.vecMaxMicro(col(vecCol)).as("max_micro"),
        count(col(vecCol)).as("n_vecs"))
      .withColumn(outCol,
        transform(col("max_micro"), s => s.cast("double") / 1e6))
}
