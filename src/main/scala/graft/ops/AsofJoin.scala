package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single most recent
  * right row at or before the left row's time, per key. The classic
  * point-in-time enrichment of event pipelines ("attribute each
  * purchase to the last preceding click"), an operator Spark has no
  * built-in for.
  *
  * Spark-first implementation (SURVEY §4 preference order (a): compose
  * built-ins): tag both sides, UNION, and run one
  * `last(right, ignoreNulls)` window over (key, time) — a single
  * shuffle on the join keys plus a per-partition sort, instead of the
  * naive range join (which explodes to |L|·|R| per key before picking
  * the max). Scales as a plain window: each key group is processed
  * streamingly in one pass; skewed keys are bounded by the window
  * sort, not a join blow-up.
  */
object AsofJoin {

  /** Backward as-of join. Schema: all `left` columns, plus every
    * non-key `right` column (null when no right row qualifies — left
    * outer semantics).
    *
    * Ordering is made total and deterministic: rows sort by
    * (time, side, tie). With `strict = false` (default) a right row at
    * exactly the left row's time matches (right sorts first at equal
    * time); with `strict = true` only strictly-earlier right rows match.
    * Among right rows with the same time and key, the one with the
    * LARGEST `rightTie` wins.
    *
    * Right non-key column names must not clash with left's — rename
    * before joining. */
  def asofBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                   leftTime: String, rightTime: String,
                   leftTie: String, rightTie: String,
                   strict: Boolean = false): DataFrame =
    asofImpl(left, right, on, leftTime, rightTime, leftTie, rightTie,
      strict, forward = false)

  /** Forward as-of join: for each left row, the single EARLIEST right
    * row at or after (strict: strictly after) the left row's time, per
    * key — same union + one-window-pass shape as [[asofBackward]],
    * mirrored. Among right rows with the same time and key, the one
    * with the SMALLEST `rightTie` wins. */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTime: String, rightTime: String,
                  leftTie: String, rightTie: String,
                  strict: Boolean = false): DataFrame =
    asofImpl(left, right, on, leftTime, rightTime, leftTie, rightTie,
      strict, forward = true)

  /** The one union + one-window pass both directions share. The
    * direction decides three things only: the window frame (preceding
    * + last for backward, following + first for forward — which also
    * yields largest-tie-wins backward, smallest-tie-wins forward under
    * the one ascending (__t, __side, __tie) ordering), and the side
    * encoding: equal-time right rows must sort INSIDE the frame when
    * inclusive and OUTSIDE it when strict, and which side of the left
    * row "inside" is flips with the direction. */
  private def asofImpl(left: DataFrame, right: DataFrame, on: Seq[String],
                       leftTime: String, rightTime: String,
                       leftTie: String, rightTie: String,
                       strict: Boolean, forward: Boolean): DataFrame = {
    require(on.nonEmpty, "need at least one join key")
    // NULL discipline = equi-join semantics (what the naive range join
    // this op replaces would produce): a right row with a null key or
    // null time can never legitimately qualify — unscreened, the
    // ascending nulls-FIRST sort would put it before every real time
    // and backward joins would "match" it, and partitionBy groups null
    // keys together so null-key sides would enrich each other. Left
    // rows always survive (left-outer contract): a null-key left row
    // sits alone in its partition, and a null-TIME left row is blanked
    // below (its frame would otherwise span the whole partition on the
    // forward side).
    val rightClean = right.where(
      (on.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
    // Resolver-aware on both screens: `col(name)` resolves right-side
    // `ID` to an `id` key, and a left `Price` / right `price` pair
    // would make the final by-name selects ambiguous — exact-case
    // checks would let both slip past.
    val sameR = graft.Cols.same(right) _
    val rPayload = right.columns.filterNot(c => on.exists(sameR(c, _))).toSeq
    val clash = graft.Cols.overlap(left, rPayload)
    require(clash.isEmpty, s"right columns clash with left, rename them: $clash")

    val lStructCol = struct(left.columns.map(col).toSeq: _*)
    val rStructCol = struct(rPayload.map(col): _*)
    val lType = left.select(lStructCol.as("s")).schema("s").dataType
    val rType = right.select(rStructCol.as("s")).schema("s").dataType
    val (lSide, rSide) = if (strict ^ forward) (0, 1) else (1, 0)

    val lTagged = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(lSide).as("__side"), col(leftTie).as("__tie"),
        lStructCol.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rTagged = rightClean.select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rSide).as("__side"), col(rightTie).as("__tie"),
        lit(null).cast(lType).as("__l"), rStructCol.as("__r")): _*)

    val ordered = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
    val matched =
      if (forward)
        first(col("__r"), ignoreNulls = true)
          .over(ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__r"), ignoreNulls = true)
          .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    lTagged.unionByName(rTagged)
      .withColumn("__m0", matched)
      // A null-TIME left row has no position on the time axis: blank
      // its enrichment (forward's [current, following) frame would
      // otherwise cover the whole partition and hand it the key's
      // earliest right row).
      .withColumn("__m",
        when(col("__t").isNull, lit(null).cast(rType)).otherwise(col("__m0")))
      .where(col("__side") === lSide)
      .select(left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(c)): _*)
  }
}
