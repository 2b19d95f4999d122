package graft.ops

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillLocf: per-key grid, bucket-last wins, gaps carry forward") {
    val obs = Seq(
      // key A: obs in buckets 0 (two, last wins) and 30; gaps at 10, 20
      ("a", 3L, 1.0, 1L), ("a", 7L, 2.0, 2L), ("a", 31L, 9.0, 3L),
      // key B: single observation -> single tick, no gaps
      ("b", 15L, 5.0, 4L),
      // key A bucket 0 tie on ts: higher tie column wins
      ("a", 7L, 3.0, 5L)
    ).toDF("k", "ts", "v", "eid")
    val got = Timeseries.gapFillLocf(obs, "k", "ts", "v", step = 10L, tieCol = "eid")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      ("a", 0L) -> 3.0,   // bucket-last: ts=7 tie=5 beats ts=7 tie=2 and ts=3
      ("a", 10L) -> 3.0,  // gap -> LOCF
      ("a", 20L) -> 3.0,  // gap -> LOCF
      ("a", 30L) -> 9.0,
      ("b", 10L) -> 5.0))
    // grid is per-key: B has exactly one tick, A four
    assert(got.keys.count(_._1 == "b") == 1)
    assert(got.keys.count(_._1 == "a") == 4)
    // partition-independence
    val again = Timeseries.gapFillLocf(obs.repartition(7), "k", "ts", "v",
        step = 10L, tieCol = "eid")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(again == got)
  }
}
