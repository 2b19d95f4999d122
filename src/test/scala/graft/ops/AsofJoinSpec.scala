package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // clicks per user: u1 at t=10,20,20(two ids),40; u2 none.
  private val clicks = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 102L), (1L, 40L, 103L),
    (3L, 5L, 300L)
  ).toDF("user_id", "click_us", "click_eid")

  private val purchases = Seq(
    (1L, 20L, 900L),  // equal-time click exists (eids 101/102)
    (1L, 39L, 901L),  // latest earlier click = t20
    (1L, 50L, 902L),  // latest = t40
    (2L, 15L, 903L),  // user with no clicks
    (3L, 4L, 904L)    // click exists but only AFTER
  ).toDF("user_id", "purchase_us", "purchase_eid")

  private def run(strict: Boolean) =
    AsofJoin.asofBackward(purchases, clicks, Seq("user_id"),
        "purchase_us", "click_us", "purchase_eid", "click_eid", strict = strict)
      .collect()
      .map(r => r.getAs[Long]("purchase_eid") ->
        Option(r.getAs[Any]("click_eid")).map(_.asInstanceOf[Long]))
      .toMap

  test("inclusive: equal-time click matches; ties pick max right tie; no-match is null") {
    val m = run(strict = false)
    assert(m(900L).contains(102L)) // t=20 click counts; max eid among equal-time wins
    assert(m(901L).contains(102L))
    assert(m(902L).contains(103L))
    assert(m(903L).isEmpty)        // user 2: no clicks at all
    assert(m(904L).isEmpty)        // user 3: click is strictly after
  }

  test("strict: equal-time click does NOT match") {
    val m = run(strict = true)
    assert(m(900L).contains(100L)) // only the t=10 click is strictly earlier
    assert(m(901L).contains(102L))
    assert(m(902L).contains(103L))
  }

  test("result carries every left row exactly once") {
    assert(run(strict = false).size == purchases.count())
  }

  private def runFwd(strict: Boolean) =
    AsofJoin.asofForward(purchases, clicks, Seq("user_id"),
        "purchase_us", "click_us", "purchase_eid", "click_eid", strict = strict)
      .collect()
      .map(r => r.getAs[Long]("purchase_eid") ->
        Option(r.getAs[Any]("click_eid")).map(_.asInstanceOf[Long]))
      .toMap

  test("forward inclusive: equal-time matches with min tie; earliest later row otherwise") {
    val m = runFwd(strict = false)
    assert(m(900L).contains(101L)) // equal-time t=20, min eid wins
    assert(m(901L).contains(103L)) // next click after t=39 is t=40
    assert(m(902L).isEmpty)        // nothing after t=50
    assert(m(903L).isEmpty)        // user 2: no clicks
    assert(m(904L).contains(300L)) // user 3: click at t=5 is after t=4
  }

  test("forward strict: equal-time click does NOT match") {
    val m = runFwd(strict = true)
    assert(m(900L).contains(103L)) // skips the t=20 clicks, next is t=40
    assert(m(901L).contains(103L))
    assert(m(904L).contains(300L))
  }

  test("forward carries every left row exactly once") {
    assert(runFwd(strict = false).size == purchases.count())
  }

  test("null times/keys never fabricate matches: right nulls screened, null-time left rows blank") {
    // Right rows with a null time or null key sort before every real
    // time (asc nulls first) / share a null-key partition — unscreened,
    // backward joins "matched" them and null-key sides enriched each
    // other. A null-TIME left row's forward frame would span the whole
    // partition.
    val dirtyClicks = Seq(
      (Some(1L), Option.empty[Long], 555L),   // null time, real key
      (Option.empty[Long], Some(10L), 666L),  // null key
      (Some(1L), Some(20L), 101L)
    ).toDF("user_id", "click_us", "click_eid")
    val dirtyPurch = Seq(
      (Some(1L), Some(5L), 900L),             // before every real click
      (Some(1L), Option.empty[Long], 901L),   // null purchase time
      (Option.empty[Long], Some(15L), 902L)   // null key
    ).toDF("user_id", "purchase_us", "purchase_eid")
    def enrichOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("purchase_eid") ->
        Option(r.getAs[Any]("click_eid"))).toMap
    val back = enrichOf(AsofJoin.asofBackward(dirtyPurch, dirtyClicks,
      Seq("user_id"), "purchase_us", "click_us", "purchase_eid", "click_eid"))
    // all three left rows present; none picks up the null-time or
    // null-key click
    assert(back == Map(900L -> None, 901L -> None, 902L -> None))
    val fwd = enrichOf(AsofJoin.asofForward(dirtyPurch, dirtyClicks,
      Seq("user_id"), "purchase_us", "click_us", "purchase_eid", "click_eid"))
    // forward: the t=5 purchase legitimately matches the t=20 click;
    // the null-time and null-key left rows stay blank
    assert(fwd == Map(900L -> Some(101L), 901L -> None, 902L -> None))
  }

  test("clashing right column names are rejected") {
    val bad = clicks.withColumnRenamed("click_eid", "purchase_eid")
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(purchases, bad, Seq("user_id"),
        "purchase_us", "click_us", "purchase_eid", "purchase_eid")
    }
  }
}
