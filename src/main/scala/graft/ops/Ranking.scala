package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact GLOBAL ranking without a single-reducer window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY ships every
  * input row to ONE task — the recurring scale-killer this module
  * replaces (see the DSIR-selection verdict finding). The alternative
  * here is the classic distributed rank: range-repartition on the sort
  * key (each reducer owns a contiguous key range, sampled boundaries),
  * sort within partitions, then assign global positions with
  * `RDD.zipWithIndex` — whose per-partition counting pass and indexing
  * pass both reuse the range shuffle's output files, so the data is
  * shuffled ONCE and every stage is parallel.
  *
  * The `.rdd` hop is deliberate: the per-partition "number rows by
  * position, offset by the sizes of all earlier partitions" step is
  * genuine per-partition imperative logic with no Catalyst operator
  * (a `Window.partitionBy(spark_partition_id())` twin would re-shuffle
  * the corpus a second time just to group what is already grouped).
  *
  * Determinism: callers must pass a TOTAL order (include an id
  * tie-break). Range boundaries vary with sampling, but positions are a
  * pure function of the total order, so results are bit-identical run
  * to run. Null keys follow Spark sort semantics (asc = nulls first,
  * desc = nulls last) — same as the window form.
  */
object Ranking {

  /** `row_number() OVER (ORDER BY order...)` as a distributed plan:
    * appends `outCol` (1-based LongType global position). `order` must
    * be a total order for deterministic output. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
                      numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one sort key")
    val spark = df.sparkSession
    val sorted = (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
                  else df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }

  /** `ntile(buckets) OVER (ORDER BY order...)` as a distributed plan:
    * appends `outCol` (1-based LongType bucket). Replicates SQL ntile
    * exactly — with n rows, the first n % buckets buckets hold
    * ceil(n/buckets) rows, the rest floor(n/buckets) — so ties split
    * across bucket boundaries by the order's tie-break, just like the
    * window form. Total row count joins in as a broadcast max over the
    * already-computed positions (no extra pass over the input). */
  def ntileGlobal(df: DataFrame, buckets: Int, order: Seq[Column],
                  outCol: String, numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ranked = globalRowNumber(df, order, "__gr", numPartitions)
    val total = ranked.agg(max(col("__gr")).as("__n"))
    val b = lit(buckets.toLong)
    val base = floor(col("__n") / b).cast("long")          // floor(n / buckets)
    val rem = col("__n") - base * b                        // n % buckets
    val bigSpan = rem * (base + lit(1L))                   // rows in the +1-sized buckets
    ranked.crossJoin(broadcast(total))
      .withColumn(outCol,
        when(col("__gr") <= bigSpan,
          floor((col("__gr") - lit(1L)) / (base + lit(1L))).cast("long") + lit(1L))
        .otherwise(
          rem + floor((col("__gr") - lit(1L) - bigSpan) / base).cast("long") + lit(1L)))
      .drop("__gr", "__n")
  }
}
