package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair left rows with right rows whose time
  * falls in a window around the left row's time, per key. Spark has no
  * native range join: the naive form is a cross-join-per-key with a
  * post-filter, which explodes on hot keys and cannot prune.
  *
  * Bucketed implementation (the standard distributed range-join trick):
  * both sides get a bucket key (the bucket's START, in pure long
  * arithmetic — a `floor(time / bucket)` id routes through a DOUBLE
  * quotient that mis-buckets times above 2^53, silently dropping
  * boundary matches on epoch-nano data); the LEFT side is
  * exploded to every bucket its window overlaps (a small constant:
  * `(before + after) / bucket + 1`), the join runs as a plain equi-join
  * on (keys, bucket) — hash-shuffled, AQE/skew-splittable, no cross
  * product — and the exact window predicate filters the candidates.
  * Each (left, right) pair matches in exactly ONE bucket (the right
  * row's own), so no dedup pass is needed.
  */
object RangeJoin {

  /** Inner interval join: right rows with
    * `leftTime - before <= rightTime <= leftTime + after`, same `on`
    * keys. Times are numeric (e.g. epoch micros). `bucket` trades
    * explosion factor (window/bucket copies of the left side) against
    * candidate precision; a bucket ≈ the window size explodes ~2×. */
  def intervalJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTime: String, rightTime: String,
                   before: Long, after: Long, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    require(before >= 0 && after >= 0, "window bounds must be non-negative")
    val lo = (col(leftTime) - before).cast("long")
    val hi = (col(leftTime) + after).cast("long")
    val lBucketed = left.withColumn("__bucket",
      explode(sequence(bucketStart(lo, bucket), bucketStart(hi, bucket),
        lit(bucket))))
    val rBucketed = right.withColumn("__bucket",
      bucketStart(col(rightTime).cast("long"), bucket))
    lBucketed.join(rBucketed, on :+ "__bucket")
      .where(col(rightTime) >= col(leftTime) - before &&
        col(rightTime) <= col(leftTime) + after)
      .drop("__bucket")
  }

  /** Largest multiple of `d` ≤ x — the bucket's start, used directly as
    * the equi-join key. Delegates to the ONE shared definition
    * ([[Timeseries.bucketStart]] — exact long arithmetic at any
    * magnitude, pmod exact for negative x too). */
  private def bucketStart(x: Column, d: Long): Column =
    Timeseries.bucketStart(x, d)
}
