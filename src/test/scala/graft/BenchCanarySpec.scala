package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench canary's judging rules — the loaded-box
  * demos in BENCH_NOTES prove the MEASUREMENT end; these prove the
  * adjudication arithmetic, including the edge shapes the demos
  * surfaced (retry-triggered mid-window readings, the starvation
  * reading gap, the min-vs-median base). */
class BenchCanarySpec extends AnyFunSuite {

  test("threshold is 4x the run min with a 0.3s floor") {
    // tiny quiet readings -> the floor governs
    assert(BenchCanary.spikeThreshold(Seq(0.05, 0.08, 0.06)) == 0.3)
    // slow-box readings -> 4x min governs
    assert(BenchCanary.spikeThreshold(Seq(0.2, 0.5, 0.25)) == 0.8)
    // min, NOT median: a burst-heavy tail must not raise the bar
    assert(BenchCanary.spikeThreshold(Seq(0.06, 0.9, 0.8, 0.7)) == 0.3)
    intercept[IllegalArgumentException](BenchCanary.spikeThreshold(Nil))
  }

  private val quiet = Seq(0.0 -> 0.06, 5.0 -> 0.07, 10.0 -> 0.06, 15.0 -> 0.05)

  test("quiet timeline flags nothing") {
    assert(BenchCanary.suspects(quiet,
      Seq("a" -> (1.0, 2.0), "b" -> (6.0, 12.0))).isEmpty)
  }

  test("a spiked bounding reading flags the windows it bounds, not others") {
    val t = Seq(0.0 -> 0.06, 5.0 -> 0.9, 10.0 -> 0.06, 15.0 -> 0.05)
    val got = BenchCanary.suspects(t, Seq(
      "before_spike" -> (1.0, 4.0),   // after-bound = the 5.0 spike
      "after_spike" -> (6.0, 9.0),    // before-bound = the 5.0 spike
      "far_away" -> (11.0, 14.0)))    // bounded by 10.0 and 15.0, both quiet
    assert(got == Seq("before_spike", "after_spike"))
  }

  test("a retry-triggered reading INSIDE a long window flags it (the starvation-gap shape)") {
    // Boundary readings quiet on both sides of a 50s gap; the only
    // evidence is the mid-window reading the retry path took.
    val t = Seq(0.0 -> 0.06, 29.0 -> 0.06, 60.0 -> 2.76, 79.0 -> 0.06)
    assert(BenchCanary.suspects(t, Seq("stalled" -> (30.0, 78.0))) ==
      Seq("stalled"))
    // and a quiet inside reading does not
    val t2 = Seq(0.0 -> 0.06, 29.0 -> 0.06, 60.0 -> 0.07, 79.0 -> 0.06)
    assert(BenchCanary.suspects(t2, Seq("fine" -> (30.0, 78.0))).isEmpty)
  }

  test("readings exactly at the window edges count as bounds") {
    val t = Seq(0.0 -> 0.06, 10.0 -> 0.9)
    assert(BenchCanary.spikedNear(t, 0.3, start = 2.0, end = 10.0))
    assert(BenchCanary.spikedNear(Seq(0.0 -> 0.9, 5.0 -> 0.06), 0.3,
      start = 0.0, end = 4.0))
  }

  test("suspicion tier is 2.5x warmup with a 0.5s floor") {
    // overhead-bound micro-query: floor governs, never fires on quiet
    assert(BenchCanary.suspicionThreshold(0.1) == 0.5)
    // data-bound heavy: 2.5x its own warmup governs
    assert(BenchCanary.suspicionThreshold(1.2) == 3.0)
    // sits BELOW the retry gate max(5x warmup, 1.0) for every warmup:
    // the band (2.5x, 5x] is exactly the r12 blind spot
    for (w <- Seq(0.05, 0.2, 0.5, 1.0, 3.0))
      assert(BenchCanary.suspicionThreshold(w) < math.max(5.0 * w, 1.0))
  }

  test("a suspicion-tier reading right after a burst victim flags it (the r12 blind-spot shape)") {
    // Burst inflates one mid-group query 2.8x (no retry fires); the
    // suspicion tier appends a reading at the query's end while the
    // burst is still running. Boundary readings 4 queries apart are
    // all quiet — without the end-reading this window has no evidence.
    val t = Seq(0.0 -> 0.06, 4.0 -> 0.06, 7.4 -> 0.85, 9.0 -> 0.06)
    assert(BenchCanary.suspects(t, Seq(
      "before" -> (0.5, 3.5),
      "victim" -> (4.5, 7.4),   // after-bound = the 7.4 suspicion reading
      "after" -> (7.6, 8.5))) == Seq("victim", "after"))
    // Same shape, burst already over when the reading lands -> quiet
    // reading, nothing flagged: an honestly data-bound heavy stays
    // unflagged WITH evidence instead of via a blind gap.
    val t2 = Seq(0.0 -> 0.06, 4.0 -> 0.06, 7.4 -> 0.07, 9.0 -> 0.06)
    assert(BenchCanary.suspects(t2, Seq("victim" -> (4.5, 7.4))).isEmpty)
  }

  test("uniform elevation never flags (all readings scale together)") {
    val t = Seq(0.0 -> 0.25, 5.0 -> 0.3, 10.0 -> 0.28, 15.0 -> 0.26)
    // threshold = 4 x 0.25 = 1.0; nothing exceeds it
    assert(BenchCanary.suspects(t, Seq("q" -> (1.0, 9.0))).isEmpty)
  }
}
