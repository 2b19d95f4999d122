package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Vector similarity/distance expressions over `array<double>` columns.
  *
  * Spark-first replacement for the reference's FAISS scoring kernels
  * (reference: src/langchain_memvid/index.py:309-338 `search_text`,
  * metrics at index.py:143-149). All built from codegen'd higher-order
  * array functions — no UDFs — so they stay inside whole-stage codegen
  * and match a sequential-fold evaluation order (which keeps results
  * bitwise-reproducible across engines that loop the same way).
  *
  * Inputs are cast to `array<double>`; pass float arrays freely.
  */
object VectorFunctions {

  /** Cast to array<double> so products/sums run in double precision. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  private def binExpr(a: Column, b: Column)(
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftSqlBridge.column(f(
      GraftSqlBridge.expression(asDouble(a)),
      GraftSqlBridge.expression(asDouble(b))))

  /** Sequential-fold dot product: sum_i a_i * b_i (fused codegen loop —
    * bit-identical to [[dotProductSql]]). */
  def dotProduct(a: Column, b: Column): Column = binExpr(a, b)(DotProductExpr)

  /** Cosine similarity: dot(a,b) / (|a| * |b|), fused single pass.
    * Same formula as the reference's normalize-then-inner-product path
    * (index.py:293-295, :322-324) without requiring pre-normalization. */
  def cosineSimilarity(a: Column, b: Column): Column = binExpr(a, b)(CosineSimilarityExpr)

  /** L2 (Euclidean) distance, fused. */
  def l2Distance(a: Column, b: Column): Column = binExpr(a, b)(L2DistanceExpr)

  // -- pure-SQL (higher-order-function) forms: reference semantics the
  // fused expressions must match bitwise; also what external SQL oracles
  // replicate. Kept for parity tests and for engines without the
  // extension expressions.

  def dotProductSql(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm: sqrt(sum_i a_i^2). */
  def l2Norm(a: Column): Column = {
    val ad = asDouble(a)
    sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
  }

  def cosineSimilaritySql(a: Column, b: Column): Column =
    dotProductSql(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance: sum_i (a_i - b_i)^2. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  def l2DistanceSql(a: Column, b: Column): Column = sqrt(l2DistanceSq(a, b))

  /** L2-normalize a vector column (reference: faiss.normalize_L2,
    * index.py:293-295). Zero vectors pass through unchanged. */
  def l2Normalize(a: Column): Column =
    // let1-bind the array AND the norm: referencing the O(d) norm (and
    // through it the whole input expression tree) inside the transform
    // lambda would re-evaluate it once per OUTPUT ELEMENT — O(d^2) per
    // row on the embedder hot paths (same projection-collapse trap the
    // minhash signature hit; quantizeInt8 binds for the same reason).
    TextFunctions.let1(asDouble(a)) { ad =>
      TextFunctions.let1(l2Norm(ad)) { n =>
        when(n === 0.0, ad).otherwise(transform(ad, x => x / n))
      }
    }

  /** Max |x_i| — the symmetric int8 quantization scale. */
  def maxAbs(a: Column): Column =
    array_max(transform(asDouble(a), x => abs(x)))

  /** Symmetric int8 scalar quantization: q_i = round(x_i·127 / maxAbs)
    * in [-127, 127]; all-zero vectors quantize to zeros. 4× smaller
    * storage (byte-range ints; parquet dictionary/bit-packing shrinks
    * further) at ~0.5% cosine error on unit vectors — the standard
    * FAISS SQ8 trade. The scale is evaluated once per row (let1-bound),
    * not once per element. */
  def quantizeInt8(a: Column): Column = {
    val ad = asDouble(a)
    // BYTE elements, not int: the 4x-smaller claim depends on 1-byte
    // cells, and [[DotProductInt8Expr]] reads with getByte — an
    // array<int> column composed into dotProductInt8 would read 1-byte
    // strides across 4-byte cells (silently wrong products; analysis
    // now also rejects the mismatch). Values are in [-127, 127] by
    // construction, so the cast is exact.
    TextFunctions.let1(maxAbs(ad)) { m =>
      when(m === 0.0, transform(ad, _ => lit(0).cast("byte")))
        .otherwise(transform(ad, x => round((x * 127.0) / m).cast("byte")))
    }
  }

  /** Inverse of [[quantizeInt8]] given the original scale. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127.0)

  /** Exact integer dot product over two `array<tinyint>` int8 vectors
    * (fused codegen loop, see [[DotProductInt8Expr]]). */
  def dotProductInt8(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductInt8Expr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Seeded Rademacher (+-1) sign matrix for [[randomProjection]]:
    * s(j,i) = parity of hash60("rp:seed:j:i") — a pure function of the
    * seed, so any engine regenerates the identical matrix (the same
    * literal-coefficients discipline as minhashCoeffs). */
  def rpSigns(seed: String, outDim: Int, inDim: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until outDim).map(j => (0 until inDim).map(i =>
      if (HashFunctions.hash60Local(s"rp:$seed:$j:$i") % 2 == 0) 1.0 else -1.0))

  /** Johnson-Lindenstrauss random projection with a seeded Rademacher
    * matrix (Achlioptas 2001's database-friendly +-1 variant):
    * y_j = round(Σ_i x_i·s(j,i) / sqrt(outDim), 6). Distances/angles are
    * preserved in expectation at outDim ~ O(log n / eps²) — the cheap
    * linear companion to int8/binary/PQ compression: reduce DIMENSION
    * first, quantize after. Narrow per-row arithmetic (no shuffle, no
    * fit step, nothing to persist but the seed); the input rides
    * let1-bound so projection collapse can't re-evaluate it per output
    * dimension; left-to-right sums + terminal rounding keep results
    * engine-reproducible. */
  def randomProjection(a: Column, seed: String, outDim: Int, inDim: Int): Column = {
    require(outDim > 0 && inDim > 0, "dims must be positive")
    val signs = rpSigns(seed, outDim, inDim)
    val scale = math.sqrt(outDim.toDouble)
    TextFunctions.let1(asDouble(a)) { v =>
      val projected = array((0 until outDim).map { j =>
        round(
          aggregate(zip_with(v, typedlit(signs(j)), (x, s) => x * s),
            lit(0.0), (acc, x) => acc + x) / scale, 6)
      }: _*)
      // Fail fast on a dimension mismatch: zip_with pads the shorter
      // side with nulls, which would otherwise propagate silently to
      // all-null output components.
      // Null input propagates null (like every sibling vector
      // function); only a PRESENT vector of the wrong dimension fails.
      when(v.isNull, lit(null).cast("array<double>"))
        .when(size(v) === inDim, projected)
        .otherwise(raise_error(concat(
          lit(s"randomProjection: expected vector of dim $inDim, got dim "),
          size(v).cast("string"))))
    }
  }

  /** 63-bit sign quantization: bit j of the result is 1 iff dimension
    * j of the vector is > 0 (dimensions beyond 62 are ignored; 63 bits
    * keep every engine's BIGINT shift well-defined — 1<<63 would hit
    * the sign bit). 64 doubles collapse to one long: a 64× smaller
    * candidate-generation index whose Hamming distance approximates
    * angular distance (Charikar 2002 random-hyperplane LSH with
    * axis-aligned planes — the "binary quantization" mode of modern
    * vector stores). Pair with [[hammingDistance]] to pre-rank
    * candidates cheaply, then rerank survivors with exact
    * [[cosineSimilarity]] — see q_binary_hamming. */
  def binarySign63(a: Column): Column =
    TextFunctions.let1(asDouble(a)) { v =>
      // NULL screen FIRST: size(null) is -1 here, so a null vector
      // slipped past the ===0 guard into sequence(0, -2) — a
      // DESCENDING sequence whose fold returned a real all-zeros bit
      // pattern (0L) instead of NULL. A query whose own sign bits are
      // sparse then ranks null-vec docs FIRST by Hamming distance.
      // Then guard the empty vector: sequence(0, -1) would also
      // descend and feed element_at an index of 0 (an error under
      // ANSI mode).
      when(v.isNull, lit(null).cast("long"))
        .when(size(v) === 0, lit(0L))
        .otherwise(
          aggregate(sequence(lit(0), least(size(v), lit(63)) - 1), lit(0L),
            (acc, j) => acc + when(element_at(v, (j + 1).cast("int")) > 0.0,
              call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))))
    }

  /** Hamming distance between two bit-packed longs. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** NULL a vector that contains ANY non-finite element (NaN/±Inf) —
    * the caller-side pre-screen for the pooling aggregates, which are
    * deliberately LOUD on partially-corrupt vectors (a silent 0-pool
    * or an overflowing Inf fold is the bias their guards exist to
    * prevent; see VectorAggregates.micro). A whole-vector NULL is the
    * aggregates' documented skip, so `vecSumMicro(finiteVec(v))` pools
    * the clean rows and drops the broken ones. */
  def finiteVec(a: Column): Column = {
    val v = asDouble(a)
    when(exists(v, x => isnan(x) || x === Double.PositiveInfinity ||
      x === Double.NegativeInfinity), lit(null).cast("array<double>"))
      .otherwise(v)
  }

  /** Element-wise vector SUM aggregate in exact 1e-6 fixed point
    * (micros) — merge-order-free by construction; see
    * [[VectorSumFixed6Agg]]. Returns `array<long>` of per-dimension
    * micro sums (null for an all-null group). */
  def vecSumMicro(a: Column): Column =
    GraftSqlBridge.column(
      VectorSumFixed6Agg(GraftSqlBridge.expression(asDouble(a)))
        .toAggregateExpression())

  /** Element-wise vector MAX / MIN aggregates in the same fixed point
    * (see [[VectorMinMaxFixed6Agg]]); ragged tails are absent, not
    * zero. */
  def vecMaxMicro(a: Column): Column =
    GraftSqlBridge.column(
      VectorMinMaxFixed6Agg(GraftSqlBridge.expression(asDouble(a)), isMax = true)
        .toAggregateExpression())

  def vecMinMicro(a: Column): Column =
    GraftSqlBridge.column(
      VectorMinMaxFixed6Agg(GraftSqlBridge.expression(asDouble(a)), isMax = false)
        .toAggregateExpression())

  /** Bounded grouped top-k aggregate (see [[BoundedTopKAgg]]): keeps
    * the k smallest structs by the lexicographic order of the first
    * `numOrdFields` fields, returned rank-sorted. Encode descending
    * fields by negation, include a total tie-break — the same ordering
    * contract as `min_by` over a struct key. */
  def topKStructs(ordAndPayload: Column, k: Int, numOrdFields: Int): Column =
    GraftSqlBridge.column(
      BoundedTopKAgg(GraftSqlBridge.expression(ordAndPayload), k, numOrdFields)
        .toAggregateExpression())

  /** Default ObjectHashAggregate fallback threshold applied by
    * [[withBoundedTopKConf]]: matches the key count the BENCH_NOTES
    * round-9 hot-key table was measured at (1M keys/task; 3× faster
    * than the silent sort fallback at the stock 128). */
  val BoundedTopKFallbackThreshold: Int = 1000000

  /** Scope the ObjectHashAggregate hash-mode conf to ONE bounded-top-k
    * plan: every [[BoundedTopKAgg]] runs under ObjectHashAggregateExec,
    * which silently degrades to SORT-based aggregation past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct keys per task — 3× slower at high key
    * cardinality (BENCH_NOTES round-9: 15.0 s → 5.2 s at ×2000 events).
    * That default guards UNBOUNDED agg states (collect_list); a bounded
    * top-k buffer holds ≤ k rows per key, so hash-map memory is
    * `keysPerTask × k × rowBytes` — bounded by construction — and
    * raising the threshold is safe up to the point where the partial
    * aggregate's OUTPUT (keys × k rows) is itself the cost, which the
    * shuffle pays either way.
    *
    * Scoping: the returned frame is bound to a CLONE of the session
    * carrying the raised threshold ([[GraftSqlBridge.withSessionConfs]])
    * — actions on it plan and run in hash mode, while the caller's
    * session conf (and every other query) is untouched. Operators that
    * produce bounded-top-k plans ([[graft.ops.Sampling.capPerKey]],
    * [[graft.index.VectorIndex.topKBatch]]) apply this themselves, so
    * hash mode is the shipped default, not a documented knob.
    *
    * SCOPE CAVEAT (by construction of per-frame conf scoping): frames
    * DERIVED from the returned one inherit the clone — the raised
    * threshold also governs any UNBOUNDED object aggregate the caller
    * composes downstream (e.g. a collect_list over high-cardinality
    * keys would hold 1M keys/task before sort fallback), and the
    * clone's other confs are a snapshot of the caller's session AT
    * CALL TIME (a later session-conf change does not reach derived
    * plans). Both are the price of scoping without mutating the shared
    * session; when composing further heavy aggregation or flipping
    * session confs afterwards, detach first via
    * [[GraftSqlBridge.rebind]] (the bounded agg then runs at the stock
    * threshold — slower, never wrong). */
  def withBoundedTopKConf(df: DataFrame,
                          keysPerTask: Int = BoundedTopKFallbackThreshold): DataFrame =
    GraftSqlBridge.withSessionConfs(df, Map(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" ->
        keysPerTask.toString))

  /** Score column for a metric name, mirroring the reference's metric
    * domain `cosine | ip | l2` (config.py:119-123). For l2 the score is
    * a *distance* (lower = better) surfaced as-is — the reference
    * deliberately does not flip the direction (index.py:331-333). */
  def score(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine" => cosineSimilarity(a, b)
    case "ip"     => dotProduct(a, b)
    case "l2"     => l2Distance(a, b)
    case other    => throw new IllegalArgumentException(
      s"unknown metric '$other' (expected cosine|ip|l2)")
  }

  /** True when higher score = better for the metric. */
  def higherIsBetter(metric: String): Boolean = metric != "l2"
}
