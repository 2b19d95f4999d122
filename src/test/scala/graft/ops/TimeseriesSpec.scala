package graft.ops

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("ewma: left fold seeded with the first value, hand-checked; order ties broken by id") {
    // key a ordered: 8, 4, 2 -> seed 8; 0.25*4+0.75*8 = 7; 0.25*2+0.75*7 = 5.75
    // key b: single value -> ewma == value
    val df = Seq(
      ("a", 3L, 1L, 8.0), ("a", 5L, 2L, 4.0), ("a", 9L, 3L, 2.0),
      ("b", 1L, 4L, 42.0),
      // key c: equal ts -> event_id breaks the tie (10 then 20)
      ("c", 7L, 5L, 10.0), ("c", 7L, 6L, 20.0)
    ).toDF("k", "ts", "event_id", "v")
    val got = Timeseries.ewma(df, "k", Seq("ts", "event_id"), "v", alpha = 0.25)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("a") == ((5.75, 3L)))
    assert(got("b") == ((42.0, 1L)))
    assert(got("c") == ((0.25 * 20.0 + 0.75 * 10.0, 2L)))
    // partition independence: the fold order is the sort order, not
    // the arrival order
    val again = Timeseries.ewma(df.repartition(5), "k", Seq("ts", "event_id"),
      "v", alpha = 0.25).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again("a") == 5.75)
  }

  test("ewma: null values are dropped observations, never a poisoned NULL fold") {
    val dirty = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, Option.empty[Double]), (1L, 3L, Some(3.0)),
      (2L, 1L, Option.empty[Double])  // all-null key: absent
    ).toDF("k", "id", "v")
    val got = Timeseries.ewma(dirty, "k", Seq("id"), "v", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // fold over [1.0, 3.0] only: 0.5*3 + 0.5*1 = 2.0; n counts the 2
    // observations actually folded
    assert(got == Map(1L -> ((2.0, 2L))))
  }

  test("ewma: non-finite values are dropped like nulls, never a poisoned NaN fold") {
    // A NaN double (or the string "NaN", which casts to a NON-null
    // double) passed the null screen and turned every later fold step
    // of its key to NaN — the exact whole-key poisoning the screen
    // documents preventing.
    val dirty = Seq(
      (1L, 1L, 1.0), (1L, 2L, Double.NaN), (1L, 3L, 3.0),
      (2L, 1L, Double.PositiveInfinity) // all-non-finite key: absent
    ).toDF("k", "id", "v")
    val got = Timeseries.ewma(dirty, "k", Seq("id"), "v", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2.0, 2L))))
    // the string spellings cast to non-null non-finite doubles — same screen
    val strs = Seq((1L, 1L, "1.0"), (1L, 2L, "NaN"), (1L, 3L, "3.0"))
      .toDF("k", "id", "v")
    val got2 = Timeseries.ewma(strs, "k", Seq("id"), "v", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2 == Map(1L -> 2.0))
  }

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

  test("gapFillLocf: a null key is a group like any other (null-safe join)") {
    // A plain equi-join back on the key would fabricate an all-null
    // grid for the null-key group (null = null never matches).
    val obs = Seq(
      (Option("a"), 3L, 1.0, 1L),
      (Option.empty[String], 5L, 7.0, 2L),
      (Option.empty[String], 25L, 9.0, 3L)
    ).toDF("k", "ts", "v", "eid")
    val got = Timeseries.gapFillLocf(obs, "k", "ts", "v", step = 10L,
        tieCol = "eid")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getDouble(2)).toMap
    assert(got == Map(
      (Option("a"), 0L) -> 1.0,
      (None, 0L) -> 7.0,
      (None, 10L) -> 7.0,  // gap -> LOCF inside the null-key group
      (None, 20L) -> 9.0))
  }
}
