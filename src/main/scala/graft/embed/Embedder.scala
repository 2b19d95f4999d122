package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, VectorFunctions}

/** Embedding-model seam, mirroring the reference's pluggable LangChain
  * `Embeddings` interface (reference: src/langchain_memvid/index.py:119-122;
  * mock impls tests/conftest.py:74-111). Implementations embed a whole
  * column distributively (a narrow map stage — no shuffle) and a single
  * query string driver-side (no job, mirroring `embed_query`).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Add `outCol: array<double>` computed from `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame

  /** Driver-side single-string embedding (for query vectors). Must be
    * bit-identical to [[embed]] on the same text. */
  def embedQuery(text: String): Array[Double]

  /** Whether [[embed]] is a pure NARROW transform runnable on a
    * streaming DataFrame (no cache/count/join/aggregate over the
    * input). HashEmbedder and a pre-fit MLlibEmbedder qualify;
    * Word2VecEmbedder's mean-pool join form does not and overrides
    * this to false — [[graft.streaming.StreamingOps.enrichTextStream]]
    * checks it up front instead of dying inside the stream planner. */
  def streamingSafe: Boolean = true
}

/** Deterministic sha256-seeded unit-vector embedder.
  *
  * Port of the reference's `BenchmarkEmbeddings` idea
  * (tests/conftest.py:89-111: vectors seeded by `int(sha256(text)[:8],16)`)
  * re-derived so the whole embedding is *closed-form over sha256* instead
  * of RNG state: component j = (hash60(j ++ ":" ++ text) mod 2000001)/1e6 - 1
  * ∈ [-1, 1], then L2-normalized. This keeps it: deterministic per text
  * (the property the reference relies on), computable distributively with
  * codegen'd built-ins only, and exactly reproducible in external SQL
  * engines (our DuckDB correctness oracle).
  *
  * Default dim 64 matches the driver testdata's `embeddings.embedding`
  * width; the reference benchmarks dims 128-512 with default 384
  * (tests/test_vectorstore_benchmark.py:406-433) — dim is a constructor
  * parameter, same as there.
  */
final case class HashEmbedder(dim: Int = 64) extends Embedder {
  require(dim > 0, "dim must be positive")

  /** Raw (un-normalized) embedding as a Column expression. */
  def rawEmbedCol(text: Column): Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      j => (HashFunctions.hash60(concat(j.cast("string"), lit(":"), text)) % 2000001L)
        .cast("double") / 1e6 - 1.0)

  /** Normalized embedding Column (unit L2 norm) — fused expression,
    * bit-identical to `l2Normalize(rawEmbedCol(_))` (the SQL form
    * external oracles replicate; parity asserted in HashEmbedderSpec). */
  def embedCol(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.HashEmbedExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(text), dim))

  /** Pure-SQL normalized embedding (reference for parity tests). */
  def embedColSql(text: Column): Column = VectorFunctions.l2Normalize(rawEmbedCol(text))

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, embedCol(col(textCol)))

  override def embedQuery(text: String): Array[Double] = {
    val raw = Array.tabulate(dim) { j =>
      (HashFunctions.hash60Local(s"$j:$text") % 2000001L).toDouble / 1e6 - 1.0
    }
    // Same sequential fold order as the SQL `aggregate(...)` form.
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += raw(i) * raw(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) raw else raw.map(_ / n)
  }
}
