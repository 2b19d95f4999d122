package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Element-wise vector sum aggregate in exact 1e-6 fixed point — the
  * custom `TypedImperativeAggregate` behind [[graft.ops.Pooling]]
  * (chunk-embedding -> document-embedding mean pooling).
  *
  * Why fixed point: a float element-wise sum would depend on the
  * merge order of partial buffers (partitioning, AQE, speculative
  * tasks), breaking graft's everything-is-reproducible contract. Each
  * element is quantized by TRUNCATION toward zero at 1e-6
  * (`(x * 1e6).toLong` — exactly `CAST(x * 1000000.0 AS BIGINT)`'s
  * truncating Spark semantics and DuckDB's `trunc()`; deliberately not
  * half-up rounding, whose float pre-add `floor(x + 0.5)` is NOT
  * reproducible across engines at the ulp), and the sums are exact
  * 64-bit integer adds — associative, commutative, merge-order-free.
  * Headroom: |element| <= 1 (unit vectors) gives 2^63 / 1e6 ≈ 9.2e12
  * rows per group before overflow.
  *
  * Buffers are primitive long arrays (8 bytes/dim); partial
  * aggregation (map-side combine) applies as with any Spark aggregate.
  * Ragged input lengths widen the buffer; missing tail elements count
  * as zero. Null input arrays are skipped; an all-null group returns
  * null. A null ELEMENT inside a vector throws: ArrayData.getDouble on
  * a null slot silently decodes 0.0, which would bias that dimension's
  * pooled value with no error (and [[graft.ops.Pooling]]'s n_vecs
  * denominator could never know) — a partially-null embedding is
  * corrupt input to fix upstream, not a value.
  */
/** The shared shell of the fixed-point vector aggregates: long[]
  * buffer lifecycle, the one serde format, the array<double> type
  * check, and the null-element guard — ONE definition so the two
  * aggregates' shuffle formats can't silently diverge (a length prefix
  * or endianness change must reach both or partial merges corrupt). */
sealed trait FixedPointVectorAgg
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  // (ExpectsInputTypes is unusable outside org.apache.spark.sql —
  // AbstractDataType is private[sql] in Spark 4 — so check directly.)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  protected final def nullElementError(i: Int): Nothing =
    throw new graft.GraftException(
      s"$prettyName: null element at dim $i — a partially-null " +
        "vector is corrupt input; filter or repair it upstream " +
        "(a silent 0.0 would bias the pooled dimension)")

  /** Quantize one element, rejecting non-finite values LOUDLY: NaN
    * would silently quantize to 0 (the exact silent-bias the null
    * guard above exists to prevent) and Infinity saturates to
    * Long.MaxValue and then WRAPS on the next add, corrupting the
    * dimension's fold. */
  protected final def micro(x: Double, i: Int): Long = {
    if (!java.lang.Double.isFinite(x))
      throw new graft.GraftException(
        s"$prettyName: non-finite element $x at dim $i — repair the " +
          "vector upstream (NaN would pool as 0, Infinity overflows " +
          "the fixed-point fold)")
    (x * 1e6).toLong
  }

  // Length 0 doubles as the "no non-null input" sentinel -> null. A
  // group of legitimately ZERO-DIM vectors (array() rows) lands on the
  // same sentinel and also pools to null rather than to an empty
  // array — documented conflation: zero-dim embeddings don't occur in
  // any real pipeline, and separating the states would complicate the
  // serde for an input class the engine never produces.
  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}

case class VectorSumFixed6Agg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends FixedPointVectorAgg {

  override def prettyName: String = "graft_vec_sum_micro"

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer.length >= n) buffer
        else java.util.Arrays.copyOf(buffer, n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) nullElementError(i)
        b(i) += micro(arr.getDouble(i), i)
        i += 1
      }
      b
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    val (big, small) =
      if (buffer.length >= other.length) (buffer, other) else (other, buffer)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumFixed6Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumFixed6Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumFixed6Agg =
    copy(child = newChild)
}

/** Element-wise MAX (or MIN) in the same 1e-6 truncating fixed point —
  * the max-pooling sibling of [[VectorSumFixed6Agg]]. Max/min are
  * idempotent and commutative, so merge order can't matter even in
  * float; fixed point keeps the two aggregates' quantization
  * identical so mixed pipelines (mean + max pooling over the same
  * chunks) stay mutually consistent. A dimension absent from a ragged
  * row is ABSENT (not zero): widened positions take the incoming
  * row's values. */
case class VectorMinMaxFixed6Agg(
    child: Expression,
    isMax: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends FixedPointVectorAgg {

  override def prettyName: String =
    if (isMax) "graft_vec_max_micro" else "graft_vec_min_micro"

  @inline private def pick(a: Long, b: Long): Long =
    if (isMax) math.max(a, b) else math.min(a, b)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val m = buffer.length
      val b = if (m >= n) buffer else java.util.Arrays.copyOf(buffer, n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) nullElementError(i)
        val x = micro(arr.getDouble(i), i)
        b(i) = if (i < m) pick(b(i), x) else x
        i += 1
      }
      b
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    val (big, small) =
      if (buffer.length >= other.length) (buffer, other) else (other, buffer)
    var i = 0
    while (i < small.length) { big(i) = pick(big(i), small(i)); i += 1 }
    big
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinMaxFixed6Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinMaxFixed6Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMinMaxFixed6Agg =
    copy(child = newChild)
}
