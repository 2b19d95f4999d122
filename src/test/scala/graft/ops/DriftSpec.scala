package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots have zero PSI in every bucket") {
    val a = Seq("en", "en", "de", "fr").toDF("lang")
    val got = Drift.bucketContributions(a, a, col("lang"))
      .select("psi_contrib", "kl_contrib").as[(Double, Double)].collect()
    assert(got.forall(_ == (0.0, 0.0)), got.toSeq)
    assert(Drift.psi(a, a, col("lang")) === 0.0)
  }

  test("bucket contributions match the hand formula, incl. one-sided buckets") {
    // ref: 3 en, 1 de; cur: 2 en, 2 fr -> de only in ref, fr only in cur
    val ref = Seq("en", "en", "en", "de").toDF("lang")
    val cur = Seq("en", "en", "fr", "fr").toDF("lang")
    val rows = Drift.bucketContributions(ref, cur, col("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    def contrib(p: Double, q: Double): Double = {
      val (pp, qq) = (math.max(p, 1e-6), math.max(q, 1e-6))
      BigDecimal((pp - qq) * math.log(pp / qq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows("en") === ((3L, 2L, contrib(0.75, 0.5), rows("en")._4)))
    assert(rows("de")._3 === contrib(0.25, 0.0))   // eps floor on cur side
    assert(rows("fr")._3 === contrib(0.0, 0.5))
    // moved mass => strictly positive total
    assert(Drift.psi(ref, cur, col("lang")) > 0.25)
  }

  test("null buckets match across sides and get their own label") {
    // identical distributions incl. 50% nulls -> zero PSI everywhere;
    // a non-null-safe join would split the null bucket into two
    // eps-floored rows and report huge false drift
    val a = Seq[String]("en", null, "de", null).toDF("lang")
    assert(Drift.psi(a, a, col("lang")) === 0.0)
    val rows = Drift.bucketContributions(a, a, col("lang")).collect()
    assert(rows.length == 3) // en, de, <null> — one row each
    val nullRow = rows.find(_.getString(0) == Drift.NullBucket)
    assert(nullRow.exists(r => r.getLong(1) == 2L && r.getLong(2) == 2L))
    // a genuine null-rate regression shows up as drift IN that bucket
    val b = Seq[String]("en", "en", "de", "en").toDF("lang")
    val moved = Drift.bucketContributions(a, b, col("lang"))
      .where(col("bucket") === Drift.NullBucket).head()
    assert(moved.getDouble(5) > 0.0)
  }

  test("numericBucket sends NULL values to NULL, not the top band") {
    val vals = Seq(Some(5.0), None, Some(500.0)).toDF("v")
    val got = vals.select(
        Drift.numericBucket(col("v"), Seq(60.0, 100.0)).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq === Seq(Some(0), None, Some(2)))
    // NaN joins the null bucket too: NaN < b is false for every break,
    // so a NaN-emitting scorer regression used to read as top-band
    // mass growth instead of a distinct undefined population.
    val withNan = Seq(Some(Double.NaN), Some(500.0)).toDF("v")
      .select(Drift.numericBucket(col("v"), Seq(60.0, 100.0)).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(withNan.toSeq === Seq(None, Some(2)))
    // and the contribution pass labels those rows as the null bucket
    val c = Drift.bucketContributions(vals, vals,
        Drift.numericBucket(col("v"), Seq(60.0, 100.0)))
      .collect().map(_.getString(0)).toSet
    assert(c.contains(Drift.NullBucket))
  }

  test("multiFeatureContributions == per-feature bucketContributions, one pass") {
    val df = Seq(
      (0L, "en", 10.0), (1L, "en", 80.0), (2L, "de", 10.0), (3L, "fr", 80.0),
      (4L, "fr", 200.0), (5L, "en", 10.0), (6L, "de", 80.0), (7L, "en", 200.0))
      .toDF("id", "lang", "score")
    val isRef = col("id") % 2 === 0
    val lenB = Drift.numericBucket(col("score"), Seq(50.0, 100.0))
    val multi = Drift.multiFeatureContributions(df, isRef,
        Seq("lang" -> col("lang"), "len" -> lenB))
      .collect().map(_.toSeq).toSet
    val ref = df.where(isRef)
    val cur = df.where(!isRef)
    val twoPass =
      Drift.bucketContributions(ref, cur, col("lang"))
        .select(lit("lang").as("feature"), col("*"))
        .unionAll(Drift.bucketContributions(ref, cur, lenB)
          .select(lit("len").as("feature"), col("*")))
        .collect().map(_.toSeq).toSet
    assert(multi === twoPass)
  }

  test("numericBucket assigns sorted fixed breaks half-open intervals") {
    val vals = Seq(-5.0, 0.0, 59.9, 60.0, 99.9, 100.0, 500.0).toDF("v")
    val got = vals.select(
        Drift.numericBucket(col("v"), Seq(60.0, 100.0)).as("b"))
      .as[Int].collect().toSeq
    assert(got === Seq(0, 0, 0, 1, 1, 2, 2))
    intercept[IllegalArgumentException] {
      Drift.numericBucket(col("v"), Seq(100.0, 60.0))
    }
  }

  test("an EMPTY current snapshot fires the monitor instead of going NaN-stable") {
    // 0/0 in double is NaN; Spark orders NaN greatest, so an unguarded
    // greatest(NaN, eps) stays NaN, psi sums to NaN, and a driver-side
    // `psi > 0.25` reads the empty crawl batch as STABLE.
    val ref = Seq("en", "en", "de", "fr").toDF("lang")
    val cur = ref.where(lit(false))
    val rows = Drift.bucketContributions(ref, cur, col("lang")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(5).isNaN && !r.getDouble(6).isNaN))
    val p = Drift.psi(ref, cur, col("lang"))
    assert(!p.isNaN && p > 0.25, s"psi=$p") // the guardrail FIRES
    // mirrored: empty reference, populated current
    val p2 = Drift.psi(cur, ref, col("lang"))
    assert(!p2.isNaN && p2 > 0.25, s"psi=$p2")
    // both sides empty: no buckets, no evidence, psi 0 (and no NPE)
    assert(Drift.psi(cur, cur.limit(0), col("lang")) === 0.0)
  }

  test("bucketContributionsFromCounts re-aggregates duplicate histogram rows") {
    // Two shard histograms unioned as the reference: bucket 'en' appears
    // twice; an un-aggregated join would fan out and double-count it.
    val cur = Seq("en", "en", "de").toDF("lang")
    val shardA = Drift.sideCounts(Seq("en", "de").toDF("lang"), col("lang"), "n_ref")
    val shardB = Drift.sideCounts(Seq("en").toDF("lang"), col("lang"), "n_ref")
    val unioned = shardA.unionAll(shardB)
    val whole = Drift.sideCounts(Seq("en", "de", "en").toDF("lang"),
      col("lang"), "n_ref")
    val got = Drift.bucketContributionsFromCounts(unioned, cur, col("lang"))
      .collect().map(_.toSeq).toSet
    val want = Drift.bucketContributionsFromCounts(whole, cur, col("lang"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.size == 2) // en, de — one row per bucket, no fan-out
  }
}
