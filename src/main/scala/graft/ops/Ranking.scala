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
  * sort within partitions, then assign global positions from
  * per-partition size offsets — one counting job plus one numbering
  * pass, both parallel, and the counting job materializes the range
  * shuffle whose files every later pass over the same lineage reuses.
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
                      numPartitions: Int = 0): DataFrame =
    numberedWithTotal(df, order, outCol, numPartitions)._1

  /** `ntile(buckets) OVER (ORDER BY order...)` as a distributed plan:
    * appends `outCol` (1-based LongType bucket). Replicates SQL ntile
    * exactly — with n rows, the first n % buckets buckets hold
    * ceil(n/buckets) rows, the rest floor(n/buckets) — so ties split
    * across bucket boundaries by the order's tie-break, just like the
    * window form. The total row count falls out of the same counting
    * job that computes the numbering offsets, so the bucket arithmetic
    * is pure literals — no extra pass, no agg, no crossJoin. */
  def ntileGlobal(df: DataFrame, buckets: Int, order: Seq[Column],
                  outCol: String, numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val (ranked, n) = numberedWithTotal(df, order, "__gr", numPartitions)
    bucketFromRank(ranked, buckets, n, outCol)
  }

  /** [[ntileGlobal]] with caller-supplied range boundaries — kills the
    * range-partitioner SAMPLING JOB, the dominant fixed cost when
    * several rankings chain (q_rfm's three quartiles): the caller
    * computes every chain member's boundaries in ONE
    * `percentile_approx` aggregate up front, and each ranking then
    * costs exactly one shuffle + one counting job.
    *
    * Boundary quality affects only BALANCE, never correctness: rows
    * route to the partition whose (bounds(p-1), bounds(p)] half-open
    * interval holds their route key, every partition owns a contiguous
    * key range in ascending route order, and the within-partition sort
    * plus size-offset numbering recover the exact global positions
    * regardless of where the boundaries fell (a skewed boundary set
    * degrades to fewer effective partitions — the same failure mode as
    * a skewed sampled range shuffle).
    *
    * Contract: `routeKey` (double) must be an order-isomorphic recoding
    * of the caller's primary sort key — strictly increasing, equal iff
    * equal (cast longs below 2^53 directly; NEGATE for descending) —
    * and non-null; `tieKey` (long) must complete a TOTAL order. The
    * shuffle sorts by (routeKey, tieKey) with the external pair-RDD
    * sorter, so partitions spill instead of buffering. */
  def ntileGlobalKeyed(df: DataFrame, buckets: Int, routeKey: Column,
                       tieKey: Column, outCol: String,
                       bounds: Seq[Double],
                       knownTotal: Option[Long] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val (ranked, n) =
      numberedKeyed(df, routeKey, tieKey, outCol = "__gr", bounds, knownTotal)
    bucketFromRank(ranked, buckets, n, outCol)
  }

  /** Evenly spaced interior probabilities (1/n .. (n-1)/n) for sizing a
    * [[ntileGlobalKeyed]] boundary set to `numPartitions` partitions. */
  def boundaryProbs(numPartitions: Int): Seq[Double] =
    (1 until numPartitions).map(_.toDouble / numPartitions)

  /** Small-input collapse of a CHAIN of [[ntileGlobalKeyed]] calls:
    * every chain member computed in ONE single-task pass. Each spec is
    * (routeKey, tieKey, outCol) under the same key contract as
    * [[ntileGlobalKeyed]]; buckets are shared. Chaining k rankings the
    * generic way costs k serial shuffle-sort stages — the right shape
    * when the table is large, pure fixed overhead when it fits one
    * partition. This is the by-hand twin of AQE's small-exchange
    * collapse for `.rdd` lineages: coalesce(1) (narrow — no shuffle),
    * buffer the partition, sort in memory once per spec, and emit all
    * bucket columns together. Bit-identical to the chained form — the
    * buckets are a pure function of each spec's total order.
    *
    * CALLER CONTRACT: only route here when the row count is known small
    * (the ≤64k-per-partition gate callers already size `parts` with) —
    * the single task buffers the whole input. */
  def ntileChainSmall(df: DataFrame, buckets: Int,
                      specs: Seq[(Column, Column, String)]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(specs.nonEmpty, "need at least one ranking spec")
    val width = df.schema.size
    val keyed = specs.zipWithIndex.foldLeft(df) { case (d, ((rk, tk, _), i)) =>
      // + 0.0 normalizes -0.0 to +0.0 (IEEE: x + 0.0 == x except at
      // -0.0) BEFORE the in-memory sort below: java.lang.Double.compare
      // orders -0.0 < 0.0, while Spark's sort (the large-input route in
      // ntileGlobalKeyed) treats them equal and falls to the tie key —
      // and descending metrics are encoded by negation, so -(0.0)
      // produces real -0.0 keys. Without this, a -0.0/0.0 tie straddling
      // a bucket boundary could bucket differently per route.
      d.withColumn(s"__rk$i", rk.cast("double") + lit(0.0))
        .withColumn(s"__tk$i", tk.cast("long"))
    }
    val m = specs.size
    val schema = specs.foldLeft(df.schema)((sch, sp) =>
      sch.add(sp._3, LongType, nullable = false))
    val b = buckets.toLong
    val rdd = keyed.coalesce(1).rdd.mapPartitions { it =>
      val rows = it.toArray
      val n = rows.length.toLong
      val base = n / b
      val rem = n % b
      val bigSpan = rem * (base + 1L)
      def bucketOf(gr: Long): Long =
        if (gr <= bigSpan) (gr - 1L) / (base + 1L) + 1L
        else rem + (gr - 1L - bigSpan) / math.max(base, 1L) + 1L
      val out = Array.ofDim[Long](rows.length, m)
      var j = 0
      while (j < m) {
        val rkIdx = width + 2 * j
        val order = rows.indices.sortBy(i =>
          (rows(i).getDouble(rkIdx), rows(i).getLong(rkIdx + 1)))
        var pos = 0
        while (pos < order.length) {
          out(order(pos))(j) = bucketOf(pos + 1L)
          pos += 1
        }
        j += 1
      }
      rows.iterator.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq.take(width) ++ out(i).toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  private def bucketFromRank(ranked: DataFrame, buckets: Int, n: Long,
                             outCol: String): DataFrame = {
    val b = buckets.toLong
    val base = n / b                    // floor(n / buckets)
    val rem = n % b
    val bigSpan = rem * (base + 1L)     // rows in the +1-sized buckets
    // base == 0 (n < buckets) puts every row inside bigSpan, so the
    // otherwise-branch divisor is dead there; math.max keeps it
    // non-zero anyway (ANSI-safe even if an engine pre-evaluates).
    ranked.withColumn(outCol,
      when(col("__gr") <= bigSpan,
        floor((col("__gr") - 1L) / (base + 1L)).cast("long") + 1L)
      .otherwise(
        lit(rem) + floor((col("__gr") - 1L - bigSpan) / math.max(base, 1L))
          .cast("long") + 1L))
      .drop("__gr")
  }

  /** Range-sort + number in two cooperating jobs: the counting job
    * returns per-partition sizes (whose prefix sums are the numbering
    * offsets AND whose sum is the total), then the numbering pass maps
    * positions in place. Both passes share one RDD lineage, so the
    * range shuffle's map side runs once and is reused. */
  private def numberedWithTotal(df: DataFrame, order: Seq[Column],
                                outCol: String, numPartitions: Int): (DataFrame, Long) = {
    require(order.nonEmpty, "global ranking needs at least one sort key")
    val spark = df.sparkSession
    val sorted = (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
                  else df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)
    numberFromSorted(spark, sorted.schema.add(outCol, LongType, nullable = false),
      sorted.rdd, outCol)
  }

  /** [[numberedWithTotal]] on caller-supplied boundaries: route with a
    * binary-search partitioner (no sampling job) and sort the pairs in
    * the shuffle itself (external sorter — spills, never buffers a
    * partition in memory). With EMPTY bounds and a caller-known total,
    * even the counting job disappears (one partition owns position 0,
    * so the offsets are trivial) — a tiny input then ranks with zero
    * extra jobs, which is exactly the adaptive small-shuffle collapse
    * AQE applies to Exchange nodes but `.rdd` lineages must do by
    * hand. `knownTotal`, when supplied, MUST equal df's row count. */
  private def numberedKeyed(df: DataFrame, routeKey: Column, tieKey: Column,
                            outCol: String, bounds: Seq[Double],
                            knownTotal: Option[Long]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val keyed = df.withColumn("__rk", routeKey.cast("double"))
      .withColumn("__tk", tieKey.cast("long"))
    val width = keyed.schema.size
    val b: Array[Double] = bounds.distinct.sorted.toArray
    val part = new org.apache.spark.Partitioner {
      override val numPartitions: Int = b.length + 1
      override def getPartition(key: Any): Int = {
        val k = key.asInstanceOf[(Double, Long)]._1
        // first boundary >= k: rows route to (b(p-1), b(p)]
        val i = java.util.Arrays.binarySearch(b, k)
        if (i >= 0) i else -(i + 1)
      }
    }
    val sorted = keyed.rdd
      .map(r => ((r.getDouble(width - 2), r.getLong(width - 1)), r))
      .repartitionAndSortWithinPartitions(part)
      .values
    val schema = keyed.schema.add(outCol, LongType, nullable = false)
    val (numbered, n) = knownTotal match {
      case Some(total) if b.isEmpty =>
        val rdd = sorted.mapPartitions({ it =>
          var pos = 0L
          it.map { r => pos += 1; Row.fromSeq(r.toSeq :+ pos) }
        }, preservesPartitioning = true)
        (spark.createDataFrame(rdd, schema), total)
      case _ => numberFromSorted(spark, schema, sorted, outCol)
    }
    (numbered.drop("__rk", "__tk"), n)
  }

  private def numberFromSorted(spark: org.apache.spark.sql.SparkSession,
                               schema: org.apache.spark.sql.types.StructType,
                               base: org.apache.spark.rdd.RDD[Row],
                               outCol: String): (DataFrame, Long) = {
    val sizes = base
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.foldLeft(0L)((n, _) => n + 1L))),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val rdd = base.mapPartitionsWithIndex({ (i, it) =>
      var pos = offsets(i)
      it.map { r => pos += 1; Row.fromSeq(r.toSeq :+ pos) }
    }, preservesPartitioning = true)
    (spark.createDataFrame(rdd, schema), offsets.last)
  }
}
