package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("interval join equals the naive cross+filter join (incl. negative times)") {
    // deterministic pseudo-random times straddling zero and bucket edges
    val left = (0 until 60)
      .map(i => (i % 5L, i.toLong, (i * 37 % 200) - 100L)).toDF("k", "lid", "lt")
    val right = (0 until 80)
      .map(i => (i % 5L, 1000L + i, (i * 53 % 200) - 100L)).toDF("k", "rid", "rt")

    val naive = left.join(right, Seq("k"))
      .where($"rt" >= $"lt" - 15 && $"rt" <= $"lt" + 7)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (bucket <- Seq(1L, 5L, 16L, 1000L)) {
      val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
          before = 15, after = 7, bucket = bucket)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucket=$bucket")
    }
    assert(naive.nonEmpty)
  }

  test("epoch-nano magnitudes bucket exactly (no double-quotient loss)") {
    // ~1.6e18 is far above 2^53: a floor(t/bucket) id through a double
    // quotient rounds near bucket boundaries and silently drops
    // matching pairs. The bucket-start long arithmetic must not.
    val base = 1600000000000000000L
    val lts = Seq(base + 999L, base + 1000L, base + 1001L, base + 123457L)
    val rts = Seq(base + 992L, base + 1000L, base + 1008L, base + 123450L)
    val left = lts.zipWithIndex.map { case (t, i) => (1L, i.toLong, t) }
      .toDF("k", "lid", "lt")
    val right = rts.zipWithIndex.map { case (t, i) => (1L, 100L + i, t) }
      .toDF("k", "rid", "rt")
    val naive = left.join(right, Seq("k"))
      .where($"rt" >= $"lt" - 8 && $"rt" <= $"lt" + 8)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (bucket <- Seq(7L, 1000L)) {
      val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
          before = 8, after = 8, bucket = bucket)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucket=$bucket")
    }
  }

  test("zero-width window matches exact-time rows only") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 20L, 100L), (1L, 21L, 101L), (1L, 22L, 99L)).toDF("k", "rid", "rt")
    val got = RangeJoin.intervalJoin(l, r, Seq("k"), "lt", "rt", 0, 0, 10)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(20L))
  }

  test("no pair is ever emitted twice (one bucket per right row)") {
    val l = Seq((1L, 1L, 50L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 2L, 45L)).toDF("k", "rid", "rt")
    // window 20 wide, bucket 4 -> left explodes to ~6 buckets; pair must appear once
    val got = RangeJoin.intervalJoin(l, r, Seq("k"), "lt", "rt", 10, 10, 4).count()
    assert(got == 1L)
  }
}
