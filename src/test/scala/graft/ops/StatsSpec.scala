package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("zscoreOutliers: flags known outliers per group, exact moments") {
    // group a: nine 10.0s and one 100.0 -> mean 19, sigma 27
    //   z(100) = (100-19)/27 = 3.0; z(10) = -1/3
    val rows = (Seq.fill(9)(("a", 10.0)) :+ ("a", 100.0)) ++
      Seq(("b", 5.0), ("b", 5.0)) // zero variance -> never flagged
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "value")
    val got = Stats.zscoreOutliers(df, Seq("grp"), "value", threshold = 3.0)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("id") == 9L)
    assert(r.getAs[Double]("mean") == 19.0)
    assert(r.getAs[Double]("sigma") == 27.0)
    assert(r.getAs[Double]("z") == 3.0)
    // threshold just above excludes it
    assert(Stats.zscoreOutliers(df, Seq("grp"), "value", threshold = 3.0001)
      .collect().isEmpty)
    // partition-independence (exact decimal moments)
    val again = Stats.zscoreOutliers(df.repartition(7), Seq("grp"), "value",
      threshold = 3.0).collect()
    assert(again.map(_.getAs[Long]("id")).toSeq == Seq(9L))
  }

  test("zscoreOutliers: sub-cent magnitudes survive the decimal cast") {
    // Scaled-down copy of the known-outlier group: values of order 1e-4
    // would all truncate to 0.00 under a decimal(18,2) cast (no outlier
    // ever flagged); decimal(18,6) keeps them exact.
    val rows = (Seq.fill(9)(("a", 0.001)) :+ ("a", 0.01)) // z(0.01) = 3.0
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "value")
    val got = Stats.zscoreOutliers(df, Seq("grp"), "value", threshold = 3.0,
      roundScale = 8).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(9L))
    assert(got.head.getAs[Double]("z") == 3.0)
  }

  test("null group keys are screened like any other group (null-safe join)") {
    // The groupBy keeps the null group, but a plain equi-join back on
    // the group key would never match it — null-group outliers would
    // silently vanish.
    val rows = (Seq.fill(9)((Option.empty[String], 10.0)) :+
      (Option.empty[String], 100.0)) ++ Seq((Option("b"), 5.0), (Option("b"), 5.0))
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "value")
    val z = Stats.zscoreOutliers(df, Seq("grp"), "value", threshold = 3.0)
      .collect()
    assert(z.map(_.getAs[Long]("id")).toSeq == Seq(9L))
    val iqr = Stats.iqrOutliers(df, Seq("grp"), "value", k = 1.5).collect()
    assert(iqr.map(_.getAs[Long]("id")).toSeq == Seq(9L))
  }

  test("iqrOutliers: Tukey fences from exact quartiles, robust to the outlier") {
    // group a: 1..11 plus an extreme 1000. Quartiles of the 12 values:
    //   q1 = 3.75, q3 = 9.25 (linear interpolation), iqr = 5.5
    //   fences: lo = 3.75 - 8.25 = -4.5, hi = 9.25 + 8.25 = 17.5
    // -> only 1000 is flagged: the robust point — one wild value can't
    //    drag the fences the way it drags mean/sigma.
    val vals = (1 to 11).map(_.toDouble) :+ 1000.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "grp", "value")
    val got = Stats.iqrOutliers(df, Seq("grp"), "value", k = 1.5).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(11L))
    assert(got.head.getAs[Double]("q1") == 3.75)
    assert(got.head.getAs[Double]("q3") == 9.25)
    // partition-independence
    val again = Stats.iqrOutliers(df.repartition(5), Seq("grp"), "value")
      .collect()
    assert(again.map(_.getAs[Long]("id")).toSeq == Seq(11L))
    // wider fences exclude it only at an absurd k
    assert(Stats.iqrOutliers(df, Seq("grp"), "value", k = 200.0)
      .collect().isEmpty)
  }

  test("keepAboveQuantile keeps per-group top fraction incl. threshold ties") {
    import spark.implicits._
    // group a: 1..10 -> p70 (interpolated) = 7.3 -> keep 8, 9, 10
    // group b: five 5s -> p70 = 5.0 -> ALL survive (tie policy)
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq.fill(5)(("b", 5.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "grp", "value")
    val got = Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 0.7)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Double]("value"),
        r.getAs[Double]("thr")))
    assert(got.filter(_._1 == "a").map(_._2).sorted.toSeq == Seq(8.0, 9.0, 10.0))
    assert(got.filter(_._1 == "a").forall(_._3 == 7.3))
    assert(got.count(_._1 == "b") == 5)
    // partition independence
    val again = Stats.keepAboveQuantile(df.repartition(7), Seq("grp"), "value", 0.7)
      .collect()
    assert(again.length == got.length)
    intercept[IllegalArgumentException] {
      Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 1.0)
    }
  }

  test("keepAboveQuantile null scores: dropped by default, routed through with keepNullValues") {
    import spark.implicits._
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", Some(2.0)),
      (3L, "a", Some(3.0)), (4L, "a", None), (5L, "a", None))
      .toDF("id", "grp", "value")
    // default: nulls silently dropped AND ignored by the percentile
    val dropped = Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(dropped == Seq(2L, 3L), s"got $dropped")
    // keepNullValues: null-scored rows pass through with thr attached
    val kept = Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 0.5,
      keepNullValues = true)
    val ids = kept.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 3L, 4L, 5L), s"got $ids")
    assert(kept.where($"id" === 4L).select("thr").head().getDouble(0) == 2.0)
  }

  test("non-finite scores behave like nulls: NaN never poisons a quantile threshold or a fence") {
    import spark.implicits._
    // Pre-fix: NaN orders greatest, so percentile interpolated to NaN
    // (thr = NaN wiped the whole group except its NaN row) and a NaN
    // score passed any finite gate.
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", Double.NaN), (5L, "a", Double.PositiveInfinity))
      .toDF("id", "grp", "value")
    val kept = Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 0.5)
    val ids = kept.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 3L), s"got $ids") // thr = 2.0 over the finite values
    assert(kept.where($"id" === 2L).select("thr").head().getDouble(0) == 2.0)
    // keepNullValues routes non-finite rows through like nulls
    val routed = Stats.keepAboveQuantile(df, Seq("grp"), "value", q = 0.5,
        keepNullValues = true).select("id").as[Long].collect().sorted.toSeq
    assert(routed == Seq(2L, 3L, 4L, 5L), s"got $routed")
    // IQR: fences from finite values only; the non-finite rows are
    // THEMSELVES outliers (pre-fix: every good row flagged, NaN clean)
    val iqrDf = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 2.5), (5L, "a", 100.0), (6L, "a", Double.NaN))
      .toDF("id", "grp", "value")
    val flagged = Stats.iqrOutliers(iqrDf, Seq("grp"), "value")
      .select("id").as[Long].collect().sorted.toSeq
    assert(flagged == Seq(5L, 6L), s"got $flagged")
  }

  test("zscoreOutliers: a constant group flags NOTHING, even when float " +
    "cancellation makes the variance a hair negative") {
    import spark.implicits._
    // Ten identical 0.1s: the decimal sums are exact, but in double
    // __ss/__n - mean^2 lands at ~-1.7e-18; sqrt of that is NaN, and
    // Spark orders NaN GREATER than every number — so without the
    // greatest(.,0) clamp BOTH `|z| >= 3` and `sigma > 0` turn true and
    // the whole group is "outliers".
    val df = (0 until 10).map(i => (i.toLong, "a", 0.1)).toDF("id", "grp", "value")
    assert(Stats.zscoreOutliers(df, Seq("grp"), "value").collect().isEmpty)
  }

  test("zscoreOutliers: null values don't bias the group moments") {
    import spark.implicits._
    // Same known-outlier group as the hand-checked test, plus two
    // null-valued rows. count(*) moments would read n=12 (mean 15.83,
    // sigma inflated); count(value) keeps mean 19 / sigma 27 exact.
    val rows = (Seq.fill(9)(("a", Option(10.0))) :+ ("a", Option(100.0))) ++
      Seq(("a", Option.empty[Double]), ("a", Option.empty[Double]))
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "value")
    val got = Stats.zscoreOutliers(df, Seq("grp"), "value", threshold = 3.0)
      .collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(9L))
    assert(got.head.getAs[Double]("mean") == 19.0)
    assert(got.head.getAs[Double]("sigma") == 27.0)
  }

  test("screens refuse an input that already carries their output columns") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0, 9.9)).toDF("id", "grp", "value", "mean")
    val e = intercept[IllegalArgumentException] {
      Stats.zscoreOutliers(df, Seq("grp"), "value")
    }
    assert(e.getMessage.contains("mean"))
    val df2 = Seq((1L, "a", 1.0, 9.9)).toDF("id", "grp", "value", "thr")
    intercept[IllegalArgumentException] {
      Stats.keepAboveQuantile(df2, Seq("grp"), "value", q = 0.5)
    }
    val df3 = Seq((1L, "a", 1.0, 9.9)).toDF("id", "grp", "value", "lo")
    intercept[IllegalArgumentException] {
      Stats.iqrOutliers(df3, Seq("grp"), "value")
    }
  }

  test("percentile screens take Column-resolved names (no SQL splice)") {
    import spark.implicits._
    // Any name col() can resolve must work — no string re-assembly of
    // the name or the threshold between the API and the aggregate.
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 100.0)).toDF("id", "grp", "the score")
    val kept = Stats.keepAboveQuantile(df, Seq("grp"), "the score", q = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L))
    // q1 = 1.75, q3 = 27.25, hi = 27.25 + 1.5*25.5 = 65.5 -> 100 flagged
    val iqr = Stats.iqrOutliers(df, Seq("grp"), "the score")
      .select("id").as[Long].collect().toSeq
    assert(iqr == Seq(4L))
  }
}
