package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Bounded top-k aggregate: keeps the k SMALLEST input structs by the
  * lexicographic order of their first `numOrdFields` fields, returning
  * them rank-sorted as `array<struct>`.
  *
  * This is the k>1 generalization of the `min_by` partial-aggregate
  * trick (see [[graft.index.VectorIndex.topKBatch]]'s k=1 path): as a
  * `TypedImperativeAggregate` it participates in map-side partial
  * aggregation, so each task reduces its rows to AT MOST k candidates
  * per group before the exchange — the shuffle carries
  * numPartitions × numGroups × k rows instead of every scored row. A
  * window (`row_number` ≤ k) over the same input would shuffle the
  * whole input to the rank reducers; this is the operator Spark lacks
  * for "exact grouped top-k at scale".
  *
  * Ordering contract: callers encode direction by negating descending
  * fields (exactly like `min_by`'s struct key — the two paths must stay
  * consistent) and MUST include tie-break fields that make the order
  * total, or the k-th element is nondeterministic. Field comparisons
  * match Spark's interpreted ordering: nulls first, NaN greatest,
  * -0.0 == 0.0 (SQLOrderingUtil semantics, SPARK-32110), binary UTF8
  * strings.
  *
  * Buffers hold at most k UnsafeRow copies in a size-k binary heap;
  * update/merge are O(log k) per row, serialization is the raw
  * UnsafeRow bytes.
  *
  * Execution note: as a TypedImperativeAggregate this runs under
  * ObjectHashAggregateExec, whose hash map falls back to sort-based
  * aggregation past `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` (default 128) distinct keys per task. The
  * partial-aggregation shuffle bound survives the fallback; only
  * per-task CPU degrades (a sort of the task's input). Because this
  * buffer is bounded at k rows per key, raising the threshold to the
  * expected key count is memory-safe and restores hash mode (3× at
  * high key cardinality, BENCH_NOTES round-9). Library operators that
  * build this aggregate (Sampling.capPerKey, VectorIndex.topKBatch)
  * apply the raised threshold BY DEFAULT, scoped to their own plan via
  * VectorFunctions.withBoundedTopKConf — callers constructing plans
  * directly from topKStructs should wrap theirs the same way.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    numOrdFields: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]]
  with UnaryLike[Expression] {

  private def orderableField(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         ByteType | BooleanType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.length < numOrdFields =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: struct has ${s.fields.length} fields, need >= $numOrdFields order fields")
    case s: StructType =>
      s.fields.take(numOrdFields).find(f => !orderableField(f.dataType)) match {
        case Some(f) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: order field '${f.name}' has unsupported type ${f.dataType.simpleString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct input, got ${other.simpleString}")
  }

  require(k > 0, "k must be positive")
  require(numOrdFields > 0, "need at least one order field")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes: Array[DataType] = structType.fields.map(_.dataType)
  @transient private lazy val toUnsafe = UnsafeProjection.create(fieldTypes)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  /** Per-field comparators resolved ONCE from the schema — the update
    * path runs compareKeys per input row, so a per-compare DataType
    * pattern match would sit in the hot loop. */
  @transient private lazy val fieldCmps: Array[(InternalRow, InternalRow, Int) => Int] =
    fieldTypes.take(numOrdFields).map {
      // The == short-circuit replicates SQLOrderingUtil.compareDoubles
      // (SPARK-32110): -0.0 and 0.0 compare EQUAL in Spark's interpreted
      // ordering (min_by's struct key, the k=1 path), while a bare
      // java.lang.Double.compare ranks -0.0 strictly first — the one
      // input where the k=1 and k>1 paths could disagree. NaN still
      // sorts greatest via the compare fallback (== is false for NaN).
      case DoubleType => (a: InternalRow, b: InternalRow, i: Int) => {
        val av = a.getDouble(i); val bv = b.getDouble(i)
        if (av == bv) 0 else java.lang.Double.compare(av, bv)
      }
      case FloatType => (a: InternalRow, b: InternalRow, i: Int) => {
        val av = a.getFloat(i); val bv = b.getFloat(i)
        if (av == bv) 0 else java.lang.Float.compare(av, bv)
      }
      case LongType | TimestampType | TimestampNTZType =>
        (a: InternalRow, b: InternalRow, i: Int) =>
          java.lang.Long.compare(a.getLong(i), b.getLong(i))
      case IntegerType | DateType => (a: InternalRow, b: InternalRow, i: Int) =>
        Integer.compare(a.getInt(i), b.getInt(i))
      case ShortType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Short.compare(a.getShort(i), b.getShort(i))
      case ByteType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Byte.compare(a.getByte(i), b.getByte(i))
      case BooleanType => (a: InternalRow, b: InternalRow, i: Int) =>
        java.lang.Boolean.compare(a.getBoolean(i), b.getBoolean(i))
      case StringType => (a: InternalRow, b: InternalRow, i: Int) =>
        a.getUTF8String(i).compareTo(b.getUTF8String(i))
      case d: DecimalType => (a: InternalRow, b: InternalRow, i: Int) =>
        a.getDecimal(i, d.precision, d.scale)
          .compareTo(b.getDecimal(i, d.precision, d.scale))
      case other => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admits no $other")
    }

  /** Nulls-first ascending lexicographic compare over the order fields —
    * the interpreted-ordering semantics `min_by`'s struct key uses, so
    * the k=1 and k>1 paths of a caller can never disagree. */
  private def compareKeys(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < numOrdFields) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      if (an || bn) {
        if (an != bn) return if (an) -1 else 1
      } else {
        val c = fieldCmps(i)(a, b, i)
        if (c != 0) return c
      }
      i += 1
    }
    0
  }

  // Max-heap on the key: the WORST retained row sits at the head, ready
  // to be evicted by anything smaller.
  private object reverseKeyOrder extends java.util.Comparator[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int = compareKeys(b, a)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    // Initial capacity min(k, 16), NOT k: hash-mode aggregation holds
    // one buffer per live key per task, and withBoundedTopKConf raises
    // the hash-mode key threshold on the premise that memory tracks
    // rows HELD — a size-k preallocation would pay keysPerTask × k
    // refs of empty array up front (k=1000 at 1M keys/task = ~8 GB of
    // empty heap) before any row is admitted. The queue grows itself.
    new java.util.PriorityQueue[UnsafeRow](math.min(k, 16), reverseKeyOrder)

  private def insert(buffer: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
    if (buffer.size < k) buffer.add(row)
    else if (compareKeys(row, buffer.peek()) < 0) { buffer.poll(); buffer.add(row) }

  override def update(
      buffer: java.util.PriorityQueue[UnsafeRow],
      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      // When the child is an attribute over an UnsafeRow input (the
      // caller projects the candidate struct in a codegen'd Project
      // upstream — see topKBatch), eval returns an UnsafeRow VIEW into
      // the input buffer: no per-row projection at all. Other shapes
      // fall back to the unsafe projection.
      val u = v match {
        case ur: UnsafeRow => ur
        case ir: InternalRow => toUnsafe(ir)
      }
      // Copy-on-admit: the view/projection buffer is reused by the
      // caller, so a RETAINED row must be copied — but in steady state
      // nearly every input loses to the heap head, and those rows can
      // be compared (read-only) in place. Copying before the test
      // would allocate per input row; this allocates per admitted row
      // (≤ k live + evicted churn).
      if (buffer.size < k) buffer.add(u.copy())
      else if (compareKeys(u, buffer.peek()) < 0) { buffer.poll(); buffer.add(u.copy()) }
    }
    buffer
  }

  override def merge(
      buffer: java.util.PriorityQueue[UnsafeRow],
      other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = buffer.toArray(new Array[UnsafeRow](buffer.size))
    java.util.Arrays.sort(arr, (a: UnsafeRow, b: UnsafeRow) => compareKeys(a, b))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    var size = 4
    val it0 = buffer.iterator()
    while (it0.hasNext) size += 4 + it0.next().getSizeInBytes
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) {
      val r = it.next()
      val bytes = r.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buffer = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, Platform.BYTE_ARRAY_OFFSET, len)
      buffer.add(row)
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
}
