package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing for LLM training pipelines: documents are
  * concatenated in a deterministic order (ascending id) and cut into
  * fixed-capacity token sequences; each document is assigned to the
  * sequence in which it STARTS, with spillover running into the next
  * sequence (the standard "concatenate + chunk" packing used to build
  * training batches; the reference has no training-prep surface — this
  * is a BASELINE.json pipeline extra alongside chunking/quantization).
  *
  * Scale design: the exclusive global cumulative sum that drives the
  * assignment is inherently ordered, but it does NOT need a
  * single-partition window over the corpus (the classic scalability
  * trap — WindowExec with an empty PARTITION BY pulls every row into
  * one task). Two phases instead:
  *   1. per-bucket token subtotals over coarse ordered id buckets (one
  *      small hash aggregate),
  *   2. running offsets across the bucket table (a window over
  *      corpus/bucketWidth rows — tiny),
  *   3. offsets broadcast back; the cumulative sum windows only WITHIN
  *      each bucket, so the widest window partition is one bucket,
  *      never the corpus.
  * Output is exactly what the naive global window computes (asserted in
  * PackingSpec and by the DuckDB oracle, which uses the naive form).
  */
object Packing {

  /** Assign each row to its packed sequence.
    *
    * Token counts clamp to 0 inside both cumulative sums (null → 0,
    * negative → 0): `size()` of a null array is -1 under Spark's legacy
    * default — the exact hazard [[Sampling.tokenBudget]] clamps for —
    * and one unguarded -1 makes the exclusive cumsum NON-monotone
    * (a row lands in seq_id -1 and every later offset shifts). The
    * DuckDB oracle and the naive-window parity spec clamp identically.
    *
    * @param bucketWidth width of the coarse cumsum buckets on the ID
    *        DOMAIN (`floor(id / bucketWidth)`): balanced when ids are
    *        roughly dense (store ids and the testdata tables are). Pick
    *        so that corpus/bucketWidth buckets fit a driver-side window
    *        (thousands to millions) and one bucket fits a task.
    *        WARNING — sparse ids (e.g. hash-derived, spread over
    *        [0, 2^60)) put nearly every row in its own bucket at the
    *        default width, making the bucket table corpus-sized and
    *        pulling it through the ONE ordered window below — the exact
    *        trap this op exists to avoid. Renumber to dense ids first
    *        (zipWithIndex / the store's dense ids) or widen bucketWidth
    *        until corpus/bucketWidth is comfortably driver-sized.
    * @return input columns + `cum_tokens_excl` (tokens before this row),
    *         `seq_id` (the capacity-sized sequence this row starts in),
    *         `seq_offset` (token position of the row's start within it).
    *         Rows with a NULL id are DROPPED (a null id has no position
    *         in the ascending-id concatenation order); a non-castable
    *         id raises instead.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, bucketWidth: Long = 1L << 16): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    // PRECONDITIONS: ids must be non-null (a null id would form a
    // null bucket whose token total shifts every real bucket's offset
    // while its own rows vanish in the equi-join — excluded here
    // explicitly instead), CASTABLE to long (a failed cast raises
    // rather than silently dropping the row through the null-rejecting
    // bucket join), and UNIQUE (the within-bucket cumulative sum
    // orders by id alone; duplicate ids would make tied rows'
    // cum_tokens_excl depend on physical row order). Ordering is on
    // the CAST long value, so numeric-string ids ("99" < "100000")
    // order the same way their buckets do.
    // The bucket key only needs to GROUP and ORDER consistently, so use
    // the exact bucket START (id - pmod(id, width)) rather than
    // floor(id/width): the latter's double quotient mis-buckets ids
    // above 2^53 (hash-derived ids get there), and __bucket never
    // reaches the output. seq_id's floor below IS safe: cumulative
    // token counts stay far under 2^53 for any real corpus.
    // try_cast, not cast: under ANSI a failed cast throws Spark's
    // generic CAST_INVALID_INPUT; with ANSI off it yields null and the
    // row would vanish through the bucket equi-join. try_cast makes
    // both modes land on the explicit raise below.
    val idLong = col(idCol).try_cast("long")
    val base = df.where(col(idCol).isNotNull)
      .withColumn("__idl", when(idLong.isNull,
        raise_error(concat(
          lit(s"packSequences: id in '$idCol' is not castable to long: "),
          col(idCol).cast("string")))).otherwise(idLong))
      .withColumn("__bucket",
        col("__idl") - pmod(col("__idl"), lit(bucketWidth)))
    // Clamped token term shared by BOTH sums (the clamp must agree or
    // the stitched offsets diverge from the within-bucket partials).
    // NULL clamps to 0 (absent counts are the documented contract; the
    // oracle mirrors GREATEST(COALESCE(n, 0), 0)) — but a NON-null
    // value that fails the cast is a wrong column or corrupt input and
    // raises, symmetric with the id screen above: a plain cast would
    // null it and the clamp would silently pack the whole corpus into
    // seq_id 0.
    val tokLong = col(tokensCol).try_cast("long")
    val tok = greatest(
      when(col(tokensCol).isNotNull && tokLong.isNull, raise_error(concat(
          lit(s"packSequences: token count in '$tokensCol' is not castable to long: "),
          col(tokensCol).cast("string"))))
        .otherwise(coalesce(tokLong, lit(0L))),
      lit(0L))
    val bucketTotals = base.groupBy("__bucket")
      .agg(sum(tok).as("__bt"))
    // The bucket table has corpus/bucketWidth rows — the single-ordered
    // window here runs over that tiny table, not the corpus.
    val offsets = bucketTotals.withColumn("__off",
      coalesce(sum("__bt").over(
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__bucket", "__off")
    val within = Window.partitionBy("__bucket").orderBy(col("__idl"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "__bucket")
      .withColumn("cum_tokens_excl",
        col("__off") + coalesce(sum(tok).over(within), lit(0L)))
      .withColumn("seq_id", floor(col("cum_tokens_excl") / lit(capacity)).cast("long"))
      .withColumn("seq_offset", (col("cum_tokens_excl") % lit(capacity)).cast("long"))
      .drop("__bucket", "__off", "__idl")
  }
}
