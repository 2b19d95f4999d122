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
    * non-negative and fit in `bits` bits — mod/clamp first if not; with
    * the default 21 bits up to 3 columns fit in a non-negative long.
    * Pure bit arithmetic on longs: codegen-friendly, engine-portable,
    * and order-isomorphic to the interleaving DuckDB/SQL computes. */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` along the z-order curve of `zCols` and write it:
    * range-partition by z-value (each output file owns a contiguous
    * curve segment = a small hypercube of the key space), sort within
    * partitions (tight row-group min/max), drop the helper column.
    * One shuffle — the same cost as any single-column re-sort, but the
    * resulting files prune on EVERY zCol. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], dir: String,
                  numFiles: Int, bits: Int = 21): Unit =
    df.withColumn("__zval", zvalue(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(dir)
}
