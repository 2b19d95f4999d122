package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * standard lakehouse technique for making parquet min/max statistics
  * prune on SEVERAL columns at once (Morton 1966; the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Why it matters at 100 TB: range-partitioning by one column gives
  * perfect pruning on that column and NONE on any other — a filter on
  * (user, time) over a time-sorted store still reads every file. Bit
  * interleaving maps the multi-dim key onto a space-filling curve, so
  * each file covers a small HYPERCUBE of the key space and its per-file
  * min/max ranges are tight on every interleaved dimension — predicates
  * on any subset of them skip most files (and row groups) at planning /
  * scan time, with zero runtime machinery.
  *
  * The reference has no analogue (single in-RAM FAISS index); this is
  * part of the 100 TB storage posture alongside IVF cluster
  * partitioning (partition pruning) and the persisted lexical index
  * (sort-key pruning).
  */
object Layout {

  /** Morton z-value: interleaves the low `bits` bits of each column
    * (col 0 at positions i·n, col 1 at i·n+1, …). Inputs must be
    * non-negative and fit in `bits` bits; with the default 21 bits up
    * to 3 columns fit in a non-negative long. The contract is ENFORCED
    * per row: an out-of-range input raises with the offending value
    * (the `Dedup.idAsLong` pattern — a violated input used to silently
    * interleave sign/overflow bits, destroying curve locality so files
    * stop pruning, the worst kind of wrong answer because every VALUE
    * is still correct). Callers whose keys legitimately exceed the
    * range opt in with `clamp = true`, which pins each input to
    * [0, 2^bits-1] — out-of-range keys then share the curve's edge
    * cells (locality preserved for in-range data, documented precision
    * loss at the edges). NULL inputs propagate to a NULL z-value
    * (such rows group together under a range partition), unchanged.
    * Pure bit arithmetic on longs: codegen-friendly, engine-portable,
    * and order-isomorphic to the interleaving DuckDB/SQL computes. */
  def zvalue(cols: Seq[Column], bits: Int = 21, clamp: Boolean = false): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    val maxVal = (1L << bits) - 1L
    val casts = cols.map(_.cast("long"))
    val inputs =
      // NULL must survive the clamp: least/greatest SKIP null arguments
      // (least(NULL, max) = max), so the bare clamp would silently pin
      // a NULL key to the curve's top edge among genuine max-key rows
      // instead of propagating to a NULL z-value like the unclamped
      // path does.
      if (clamp) casts.map(c =>
        when(c.isNotNull, greatest(lit(0L), least(c, lit(maxVal)))))
      else casts
    val n = cols.size
    val terms = for {
      (c, ci) <- inputs.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + ci)
    val raw = terms.reduce(_ bitwiseOR _)
    if (clamp) raw
    else {
      // ONE guard over the finished value (not per interleaved bit):
      // the hot path stays the plain shift/mask chain, and a violated
      // row raises with every input value visible. A NULL input makes
      // the predicate NULL -> otherwise -> NULL z-value, unchanged.
      val bad = casts.map(c => c < 0L || c > maxVal).reduce(_ || _)
      when(bad, raise_error(concat(
        lit(s"zvalue: input out of [0, $maxVal] (bits=$bits): ("),
        concat_ws(", ", casts.map(_.cast("string")): _*),
        lit(") — pre-scale the key or pass clamp = true"))).cast("long"))
        .otherwise(raw)
    }
  }

  /** Cluster `df` along the z-order curve of `zCols` and write it:
    * range-partition by z-value (each output file owns a contiguous
    * curve segment = a small hypercube of the key space), sort within
    * partitions (tight row-group min/max), drop the helper column.
    * One shuffle — the same cost as any single-column re-sort, but the
    * resulting files prune on EVERY zCol. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], dir: String,
                  numFiles: Int, bits: Int = 21, clamp: Boolean = false): Unit =
    df.withColumn("__zval", zvalue(zCols.map(col), bits, clamp))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(dir)
}
