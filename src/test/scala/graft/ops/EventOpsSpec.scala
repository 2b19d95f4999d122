package graft.ops

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type) — hand-designed funnel progressions
  private val events = Seq(
    // user 1 completes view -> click -> buy inside the window
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
    // user 2: click BEFORE view doesn't count; no click after view
    (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "buy"),
    // user 3: completes but the buy lands outside the window (anchor t1)
    (3L, 10L, "view"), (3L, 20L, "click"), (3L, 200L, "buy"),
    // user 4: same-timestamp step is NOT strictly after -> stalls at view
    (4L, 10L, "view"), (4L, 10L, "click"),
    // user 5 never views
    (5L, 10L, "click"), (5L, 20L, "buy"),
    // user 6: multiple candidates -> greedy earliest anchors the window
    (6L, 10L, "view"), (6L, 50L, "view"), (6L, 60L, "click"), (6L, 70L, "buy")
  ).toDF("user_id", "ts", "etype")

  test("funnel: strict order, entry-anchored window, greedy-earliest matching") {
    val got = EventOps.funnel(events, "user_id", "ts", "etype",
        Seq("view", "click", "buy"), window = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("steps_completed")))).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 6L -> 3L))
    // user 5 absent (never entered the funnel)
    assert(!got.contains(5L))
    // user 6's window anchors at the EARLIEST view (10), and 60/70 are
    // within 100 of it — matched times prove the greedy anchor
    val u6 = EventOps.funnel(events, "user_id", "ts", "etype",
        Seq("view", "click", "buy"), window = 100L)
      .where($"user_id" === 6L).head
    assert(u6.getLong(u6.fieldIndex("t1")) == 10L)
    assert(u6.getLong(u6.fieldIndex("t2")) == 60L)
    assert(u6.getLong(u6.fieldIndex("t3")) == 70L)
    // tight window: user 6's click at 60 falls outside window 40
    val tight = EventOps.funnel(events, "user_id", "ts", "etype",
        Seq("view", "click", "buy"), window = 40L)
      .collect().map(r => r.getLong(0) ->
        r.getLong(r.fieldIndex("steps_completed"))).toMap
    assert(tight(6L) == 1L && tight(1L) == 3L)
    // single-step funnel degenerates to "did step 1"
    val one = EventOps.funnel(events, "user_id", "ts", "etype",
      Seq("buy"), window = 100L)
    assert(one.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("funnel/retention drop null users and null timestamps (no phantom groups, no null-offset rows)") {
    val dirty = Seq(
      (Some(1L), Some(10L), "view"), (Some(1L), Some(20L), "click"),
      (Option.empty[Long], Some(10L), "view"),     // null user
      (Some(1L), Option.empty[Long], "view"),      // null ts
      (Some(9L), Option.empty[Long], "view")       // user with ONLY a null-ts event
    ).toDF("user_id", "ts", "etype")
    val f = EventOps.funnel(dirty, "user_id", "ts", "etype",
        Seq("view", "click"), window = 100L)
      .collect().map(r => Option(r.get(0)) -> r.getLong(r.fieldIndex("steps_completed"))).toMap
    // no phantom null-user row stuck at step 1; the null-ts-only user
    // never entered
    assert(f == Map(Some(1L) -> 2L))
    val ret = EventOps.retention(dirty.select($"user_id", $"ts"), "user_id", "ts", 10L)
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(ret.forall(_._2.isDefined), ret.mkString(",")) // no offset=null garbage
  }

  test("retention: cohort = first bucket, offsets counted once per user, exact rates") {
    // bucket width 10: user A enters bucket 0, active 0 and 2;
    // user B enters 0, active 0 only; user C enters 1, active 1 and 2.
    val ev = Seq(
      (1L, 1L), (1L, 3L), (1L, 25L), (1L, 29L), // A: buckets 0, 2 (dup rows collapse)
      (2L, 5L),                                 // B: bucket 0
      (3L, 12L), (3L, 22L)                      // C: buckets 1, 2 -> offsets 0, 1
    ).toDF("user_id", "ts")
    val got = EventOps.retention(ev, "user_id", "ts", bucketWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      (0L, 0L) -> (2L, 2L, 1.0),   // both A and B active at entry
      (0L, 2L) -> (1L, 2L, 0.5),   // only A back two buckets later
      (1L, 0L) -> (1L, 1L, 1.0),
      (1L, 1L) -> (1L, 1L, 1.0)))
  }

  test("retention: epoch-nano magnitudes bucket exactly; null users dropped") {
    // base ~1.6e18 is above 2^53, where floor(ts/width) through a
    // double quotient mis-buckets boundary events. Width 1000:
    // base is a multiple of 1000, so base+999 is still offset 0 and
    // base+1000 is offset 1 — exactly.
    val base = 1600000000000000000L
    val ev = Seq(
      (Option(1L), base + 999L), (Option(1L), base + 1000L),
      (Option.empty[Long], base + 1L), (Option.empty[Long], base + 2000L)
    ).toDF("user_id", "ts")
    val got = EventOps.retention(ev, "user_id", "ts", bucketWidth = 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    // one real user: offsets 0 and 1, cohort size 1 — null users are
    // neither cohort members (no deflated denominator) nor active rows.
    assert(got == Seq((0L, 1L, 1L), (1L, 1L, 1L)))
  }
}
