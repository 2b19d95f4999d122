package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups x overlapping member sets; exact distincts known by construction
  private val rows = (0 until 20000).map { i =>
    (s"g${i % 3}", (i * 2654435761L % 5000) + (i % 3) * 100)
  }
  private val df = rows.toDF("grp", "member")

  private def exact: Map[String, Long] =
    df.groupBy("grp").agg(countDistinct("member").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("approxDistinct within 5% of exact per group") {
    val est = Sketches.approxDistinct(df, Seq("grp"), "member", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact
    assert(est.keySet == ex.keySet)
    ex.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05, s"group $g: est ${est(g)} vs exact $n")
    }
  }

  test("shard sketches merge to the estimate of the union without rescanning") {
    // shard the data two ways; sketches built per (shard, grp)
    val sharded = df.withColumn("shard", (col("member") % 4).cast("int"))
    val perShard = Sketches.buildDistinctSketches(sharded, Seq("shard", "grp"), "member")
    assert(perShard.count() == 12) // 4 shards x 3 groups
    // merging shard sketches per group == estimating over all shards' data
    val merged = Sketches.mergeAndEstimate(perShard, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact
    ex.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.05, s"group $g: merged ${merged(g)} vs exact $n")
    }
  }

  test("count-min: overcount-only within eps*N; shard merge == whole-corpus build") {
    val words = (0 until 10000).map { i =>
      val w = if (i % 4 == 0) "hot" else if (i % 10 == 5) s"warm${i % 7}" else s"cold$i"
      ((i % 5).toString, w)
    }
    val wdf = words.toDF("shard", "word")
    val exactCounts = words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val whole = Sketches.mergeFreqSketches(
      Sketches.buildFreqSketches(wdf, Seq.empty, "word", eps = 0.001))
    // never undercounts; overcount bounded by eps * N
    exactCounts.foreach { case (w, n) =>
      val est = whole.estimateCount(w)
      assert(est >= n, s"$w undercounted: $est < $n")
      assert(est <= n + (0.001 * 10000).toLong + 1, s"$w overcounted: $est vs $n")
    }
    // shard-built sketches merge to the SAME sketch (same seed => same
    // hash functions; merge is cell-wise addition)
    val merged = Sketches.mergeFreqSketches(
      Sketches.buildFreqSketches(wdf, Seq("shard"), "word", eps = 0.001))
    exactCounts.keys.foreach { w =>
      assert(merged.estimateCount(w) == whole.estimateCount(w))
    }
    // heavy-hitter screen: candidates from any cheap source, counts from
    // the sketch
    val hh = Sketches.heavyHitters(merged,
      Seq("hot", "warm0", "cold123", "absent"), minCount = 100L)
    assert(hh.head._1 == "hot" && hh.head._2 >= 100L)
    assert(!hh.exists(_._1 == "cold123") && !hh.exists(_._1 == "absent"))
  }

  test("approxQuantiles rank error bounded vs exact percentiles") {
    val probs = Seq(0.25, 0.5, 0.95)
    val approx = Sketches.approxQuantiles(df, Seq("grp"), "member", probs, accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val n = rows.count(_._1 == "g0")
    val sortedG0 = rows.filter(_._1 == "g0").map(_._2).sorted
    probs.zipWithIndex.foreach { case (p, i) =>
      val est = approx("g0")(i)
      // positional (rank) error bound: the estimate's rank is within
      // n/accuracy of the target rank
      val rank = sortedG0.count(_ <= est)
      assert(math.abs(rank - p * n) <= n.toDouble / 10000 + 1,
        s"p=$p est=$est rank=$rank target=${p * n}")
    }
  }

  test("approxQuantiles screens NaN/Inf on floating inputs; integral outputs keep their type") {
    import spark.implicits._
    // Pre-fix: NaN folded in as the GREATEST value (p=1.0 reported NaN,
    // every other quantile's rank shifted), disagreeing with the KLL
    // twin, which silently drops NaN.
    val d = (Seq.tabulate(99)(i => ("g", (i + 1).toDouble)) :+ (("g", Double.NaN))
      :+ (("g", Double.PositiveInfinity))).toDF("grp", "v")
    val qs = Sketches.approxQuantiles(d, Seq("grp"), "v", Seq(0.5, 1.0))
      .head.getSeq[Double](1)
    assert(!qs.exists(x => x.isNaN || x.isInfinite), s"got $qs")
    assert(qs(1) == 99.0) // max of the FINITE values
    // integral inputs keep their integral output type (no silent cast)
    val ints = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "v")
    val qi = Sketches.approxQuantiles(ints, Seq("grp"), "v", Seq(1.0))
      .head.getSeq[Long](1)
    assert(qi == Seq(3L))
  }

  test("sketch merges are byte-bounded: oversize sketch tables raise instead of collecting GBs") {
    import spark.implicits._
    val many = Sketches.buildFreqSketches(
      (0 until 40).map(i => (s"g$i", s"v$i")).toDF("grp", "v"),
      Seq("grp"), "v")
    val e = intercept[IllegalArgumentException] {
      Sketches.mergeFreqSketches(many, maxSketches = 10)
    }
    assert(e.getMessage.contains("hierarchically"))
    // within the bound: merges fine
    assert(Sketches.mergeFreqSketches(many, maxSketches = 64)
      .estimateCount("v7") >= 1L)
  }

  test("KLL shard sketches: persisted bytes merge to bounded-rank-error quantiles") {
    val vals = df.select(col("member").cast("double")).as[Double].collect().sorted
    val n = vals.length
    // build per-partition sketches over an 8-shard layout, round-trip
    // the BYTES through a collect (stand-in for parquet persistence),
    // then merge and query — no rescan of the data.
    val shardBytes = Sketches.buildQuantileShardSketches(
      df.repartition(8), "member", k = 200)
    assert(shardBytes.count() == 8)
    val merged = Sketches.mergeQuantileSketches(shardBytes)
    assert(merged.getN == n)
    val probs = Seq(0.1, 0.5, 0.9)
    val ests = Sketches.quantilesFrom(merged, probs)
    probs.zip(ests).foreach { case (p, est) =>
      val rank = vals.count(_ <= est)
      // k=200 gives ~1.65% rank error at 99% confidence; assert 3%
      assert(math.abs(rank - p * n) <= 0.03 * n,
        s"p=$p est=$est rank=$rank target=${p * n}")
    }
  }
}
