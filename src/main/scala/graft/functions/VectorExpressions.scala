package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Catalyst expressions for the vector hot path (SURVEY §7.2 step
  * 7). The pure-SQL `aggregate(zip_with(...))` forms in
  * [[VectorFunctions]] are correct but interpreted per-element through
  * higher-order-function lambdas; these expressions run a single fused
  * primitive loop inside whole-stage codegen — same arithmetic, same
  * left-to-right fold order, bit-identical results (asserted by
  * VectorExpressionsSpec against the SQL forms).
  *
  * This is the Spark-native stand-in for the reference's C++ FAISS
  * scoring kernels (reference: src/langchain_memvid/index.py:327).
  */
object VectorExpressions {

  /** Shared fused-loop codegen: f(aVar, bVar, nVar, resultVar) emits the
    * loop body; result must assign `resultVar` (a declared double). */
  private[functions] def loopCode(
      ctx: CodegenContext, a: String, b: String, body: (String, String) => String): String = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    s"""
      int $n = $a.numElements();
      for (int $i = 0; $i < $n; $i++) {
        ${body(s"$a.getDouble($i)", s"$b.getDouble($i)")}
      }
    """
  }

  /** Dimension-mismatch guard shared by every fused binary kernel:
    * wraps `resultCode` so unequal-length inputs yield NULL instead of
    * a silently truncated (plausible but WRONG) score. NULL — not a
    * throw — because that is bit-what the `aggregate(zip_with(...))`
    * SQL twins produce (zip_with null-pads the shorter side, the
    * multiply nulls, the fold nulls the total — exactly a null score),
    * and usable()-style score filters already drop null scores; the
    * twins and the fused forms must stay indistinguishable on EVERY
    * input. */
  private[functions] def dimGuard(a: String, b: String, ev: ExprCode,
                                  resultCode: String): String =
    s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        $resultCode
      }
    """
}

/** dot(a, b) = sum_i a_i * b_i, sequential fold. Unequal lengths yield
  * NULL (the zip_with twin's behavior — see VectorExpressions.dimGuard). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftSqlBridge.ArrayDoubleBinaryInputs {
  // The SQL registrations (graft_dot & co.) reach these kernels with
  // whatever types the user wrote: without declared input types an
  // array<int> child passed analysis and getDouble then read 8-byte
  // strides over 4-byte elements — silently wrong scores. The bridge
  // trait declares array<double> inputs (AbstractDataType is
  // private[sql], unnameable from here), so analysis inserts the cast
  // (the exact coercion the DataFrame surface applies via asDouble)
  // or rejects scalars.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      VectorExpressions.dimGuard(a, b, ev, s"""
        double $s = 0.0;
        ${VectorExpressions.loopCode(ctx, a, b, (x, y) => s"$s += $x * $y;")}
        ${ev.value} = $s;
      """)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a| * |b|) — one pass, three accumulators.
  * Matches VectorFunctions.cosineSimilarity bitwise: each accumulator
  * folds left-to-right exactly like its SQL counterpart. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftSqlBridge.ArrayDoubleBinaryInputs { // see DotProductExpr
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      VectorExpressions.dimGuard(a, b, ev, s"""
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        ${VectorExpressions.loopCode(ctx, a, b,
          (x, y) => s"double xv = $x; double yv = $y; $dot += xv * yv; $na += xv * xv; $nb += yv * yv;")}
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) over int8-quantized vectors (`array<tinyint>`) in exact
  * 64-bit integer arithmetic — the screening kernel of SemDeDup's
  * quantized pre-filter ([[graft.ops.SemDedup]]). Integer adds are
  * associative, so the fold is order-free by construction; the fused
  * byte loop stays inside whole-stage codegen like its double sibling
  * [[DotProductExpr]]. */
case class DotProductInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftSqlBridge.ArrayByteBinaryInputs {
  // array<tinyint> declared (via the bridge trait): getByte over wider
  // element types reads 1-byte strides across 4-byte cells — garbage
  // products. Analysis now COERCES wider numeric arrays to tinyint
  // (correct values; out-of-range elements fail the ANSI cast loudly)
  // and rejects non-array inputs outright.
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_int8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      VectorExpressions.dimGuard(a, b, ev, s"""
        long $s = 0L;
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          $s += (long) $a.getByte($i) * $b.getByte($i);
        }
        ${ev.value} = $s;
      """)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 distance = sqrt(sum_i (a_i - b_i)^2), sequential fold. */
case class L2DistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftSqlBridge.ArrayDoubleBinaryInputs { // see DotProductExpr
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      VectorExpressions.dimGuard(a, b, ev, s"""
        double $s = 0.0;
        ${VectorExpressions.loopCode(ctx, a, b,
          (x, y) => s"double d = $x - $y; $s += d * d;")}
        ${ev.value} = java.lang.Math.sqrt($s);
      """)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmin over centroids of (optionally rounded) squared L2 distance to
  * `vec[start, start+len)` — the fused quantizer-assignment kernel
  * shared by IVF coarse assignment (start=0, full vector) and PQ
  * per-subspace encoding (start=sub·dsub, len=dsub). Ties resolve to
  * the lowest centroid index, and `roundScale >= 0` rounds each
  * distance EXACTLY like Spark/DuckDB `round()` (BigDecimal.valueOf,
  * HALF_UP) before the argmin — bit-identical to the HOF twin
  * (`transform` + `aggregate` + `array_position`, kept as *Sql forms
  * and asserted equal in specs), which interprets a lambda per element
  * per centroid. CodegenFallback like [[HashEmbedExpr]]: one JVM call
  * per row running nlist·dim primitive multiply-adds is the win.
  */
case class NearestCentroidExpr(child: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]], start: Int, len: Int,
    roundScale: Int, totalDim: Int = -1)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must all have the same dimension")
  require(len == Int.MaxValue || centroids.head.length == len,
    s"centroid dim ${centroids.head.length} != subvector len $len")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val avail = x.numElements() - start
    val need = cents(0).length
    // Fail fast on malformed vectors instead of truncating the distance
    // loop: a silently shortened loop returns a plausible but WRONG
    // assignment (and diverges from the zip_with HOF twin, which
    // null-pads) — corrupted IVF/PQ assignments are worse than a task
    // failure. len == Int.MaxValue claims "whole vector", so extra
    // elements are a dimension mismatch too. A sliced subspace
    // (start/len) legitimately leaves a tail beyond ITS slice, so the
    // per-slice check alone would silently prefix-encode an OVERLONG
    // vector (every subspace sees avail >= need) — `totalDim` is the
    // whole-vector dimension the slicing caller (PQ encode) knows, and
    // closes that one-sided hole with an exact-length check.
    if (avail < need || (len == Int.MaxValue && avail != need) ||
        (totalDim >= 0 && x.numElements() != totalDim))
      throw new IllegalArgumentException(
        s"graft_nearest_centroid: input has ${x.numElements()} elements, " +
          s"need ${
            if (totalDim >= 0) s"exactly $totalDim"
            else if (len == Int.MaxValue) s"exactly ${start + need}"
            else s">= ${start + need}"} " +
          s"(start=$start, centroid dim $need)")
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var j = 0
      while (j < need) {
        val t = x.getDouble(start + j) - cent(j); d += t * t; j += 1
      }
      if (roundScale >= 0)
        d = java.math.BigDecimal.valueOf(d)
          .setScale(roundScale, java.math.RoundingMode.HALF_UP).doubleValue()
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`nprobe` nearest-centroid INDICES (ascending (distance, index)
  * order) of a full vector — the multi-probe generalization of
  * [[NearestCentroidExpr]] (which is the nprobe=1 argmin), used by the
  * batch IVF prune rule to compute each query row's probe set ONCE on
  * the (small) queries side instead of per joined pair. Distance
  * rounding and the index tie-break replicate
  * `IvfIndex.Model.nearestCentroids` exactly (asserted in spec), so a
  * plan pruned by this expression probes the same clusters the
  * driver-side path probes. CodegenFallback for the same reason as
  * [[NearestCentroidExpr]]: one JVM call per query row running
  * nlist·dim primitive ops.
  */
case class NearestCentroidsExpr(child: Expression,
    centroids: IndexedSeq[IndexedSeq[Double]], nprobe: Int,
    roundScale: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must all have the same dimension")
  require(nprobe >= 1, "nprobe must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val need = cents(0).length
    if (x.numElements() != need)
      throw new IllegalArgumentException(
        s"graft_nearest_centroids: input has ${x.numElements()} elements, " +
          s"need exactly $need (centroid dim)")
    val dists = new Array[(Double, Int)](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var j = 0
      while (j < need) { val t = x.getDouble(j) - cent(j); d += t * t; j += 1 }
      if (roundScale >= 0)
        d = java.math.BigDecimal.valueOf(d)
          .setScale(roundScale, java.math.RoundingMode.HALF_UP).doubleValue()
      dists(c) = (d, c)
      c += 1
    }
    val top = dists.sortBy { case (d, i) => (d, i) }
      .take(math.min(nprobe, cents.length)).map(_._2)
    new GenericArrayData(top)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic hash embedding of a string — the fused form of
  * HashEmbedder's SQL expression (bit-identical; see HashEmbedderSpec).
  * CodegenFallback: one JVM call per row beats 64 interpreted sha2
  * sub-expressions by orders of magnitude; full codegen of SHA-256
  * would buy little more.
  */
case class HashEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  // The SQL registration (graft_hash_embed) reaches here without
  // HashEmbedder's constructor check: a non-positive dim would pass
  // analysis and then fail (dim < 0) or silently emit empty vectors
  // (dim == 0) per row at execution.
  require(dim > 0, s"graft_hash_embed: dim must be positive, got $dim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hash_embed"

  // "<j>:" prefixes precomputed once; per row only the text bytes vary.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(dim)(j => s"$j:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(input: Any): Any = {
    // UTF8String bytes ARE the UTF-8 encoding — no String round-trip.
    val textBytes = input.asInstanceOf[UTF8String].getBytes
    val raw = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      raw(j) = (HashFunctions.hash60Parts(prefixes(j), textBytes) % 2000001L).toDouble / 1e6 - 1.0
      j += 1
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += raw(i) * raw(i); i += 1 }
    val n = math.sqrt(ss)
    if (n != 0.0) {
      i = 0
      while (i < dim) { raw(i) = raw(i) / n; i += 1 }
    }
    new GenericArrayData(raw)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hamming64(a, b) = popcount(a XOR b) over two 64-bit fingerprint
  * longs — the distance half of the [[TextFunctions.simhash63]] pair
  * (near-dup docs have small hamming distance between fingerprints;
  * Dedup.simhashPairs bands on it). Registered as `graft_hamming64` so
  * a pure-SQL caller can close the loop: fingerprint with
  * graft_simhash63, then range-filter on graft_hamming64 — without it
  * the SQL route needs bit_count(a ^ b), which exists but invites the
  * untyped-coercion trap the strict bridge trait rejects (a string
  * fed to ^ coerces under legacy rules instead of failing analysis).
  * Inputs are strictly bigint (the fingerprint contract); narrower
  * integrals need an explicit CAST. Result range 0..64 as int. */
case class Hamming64Expr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.GraftSqlBridge.LongBinaryInputs {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // A bare NULL literal passes the type pin (NullType is accepted for
    // null-in/null-out), but its codegen value is an UNTYPED `null` —
    // inlining it into the primitive `^` would fail javac and silently
    // drop the whole stage to interpreted. The result is constant null
    // by the null contract, so emit exactly that.
    if (left.dataType == org.apache.spark.sql.types.NullType ||
        right.dataType == org.apache.spark.sql.types.NullType)
      ev.copy(
        code = org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.TrueLiteral,
        value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .defaultLiteral(dataType))
    else nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
