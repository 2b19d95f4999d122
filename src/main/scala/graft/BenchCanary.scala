package graft

/** Pure canary-adjudication logic for [[Bench]] — separated so the
  * driver-contract rules (spike threshold, window overlap) are unit-
  * testable instead of only demonstrable by loaded-box runs. The
  * measurement side (what a reading IS: min of two back-to-back
  * all-core jobs) stays in Bench; this object only judges numbers.
  */
object BenchCanary {

  /** Spike threshold for a run's readings: 4x the run MINIMUM with a
    * 0.3 s absolute floor. Min, not median — a burst
    * slows the queries too, stretching its own window over more
    * readings and dragging the median with it; the quietest reading
    * stays an honest estimate of the canary's constant cost. The floor
    * sits above the worst min-of-2 quiet straggler measured on this
    * box (0.18 s). */
  def spikeThreshold(readingSecs: Seq[Double]): Double = {
    require(readingSecs.nonEmpty, "no canary readings")
    math.max(4.0 * readingSecs.min, 0.3)
  }

  /** Reading-at-suspicion tier, BELOW the 5x-warmup retry gate: a
    * query whose time exceeds 2.5x its own warmup (0.5 s absolute
    * floor so overhead-bound micro-queries never fire) gets a canary
    * reading immediately after it finishes, even though nothing is
    * re-run. Why: the group-boundary cadence (every 4th query) leaves
    * ~3-second blind gaps, and the retry tier only samples at 5x —
    * r12's driver artifact carried 2.5-3x contention inflations
    * (q_opq_adc 3.40 s vs 1.17 quiet) that fell in exactly that band
    * and sailed through with no reading near them. This tier puts the
    * box state on record for short bursts too weak to trip a rerun.
    * On a quiet run the 2.5x band is mostly data-bound heavies — a
    * handful of extra ~0.16 s readings; a quiet reading beside them
    * keeps them UN-flagged, which is itself evidence. */
  def suspicionThreshold(warmupSec: Double): Double =
    math.max(2.5 * warmupSec, 0.5)

  /** Is the query window [start, end] suspect? True when any reading
    * taken INSIDE the window (retry-triggered readings land there),
    * the nearest reading at-or-before `start`, or the nearest reading
    * at-or-after `end` exceeds `threshold`. `timeline` = (offsetSec,
    * durationSec) in time order. */
  def spikedNear(timeline: Seq[(Double, Double)], threshold: Double,
                 start: Double, end: Double): Boolean = {
    val before = timeline.filter(_._1 <= start).lastOption
    val after = timeline.find(_._1 >= end)
    val inside = timeline.filter(c => c._1 > start && c._1 < end)
    (before.toSeq ++ inside ++ after.toSeq).exists(_._2 > threshold)
  }

  /** Suspect query names for a finished run. `windows` = name ->
    * (startOffset, endOffset); preserves `windows` order. */
  def suspects(timeline: Seq[(Double, Double)],
               windows: Seq[(String, (Double, Double))]): Seq[String] = {
    val thr = spikeThreshold(timeline.map(_._2))
    windows.collect {
      case (name, (s, e)) if spikedNear(timeline, thr, s, e) => name
    }
  }
}
