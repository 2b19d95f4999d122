package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed global rank/ntile must be bit-identical to the window
  * forms they replace — including tie splitting across bucket
  * boundaries, uneven buckets, null keys, and n < buckets. */
class RankingSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    // Heavy ties in v (splitting exercised), some null keys, and enough
    // rows to span several range partitions.
    (1 to 103).map(i =>
      (i.toLong, if (i % 13 == 0) None else Some((i % 7).toLong)))
      .toDF("id", "v")
  }

  test("globalRowNumber matches row_number() over the same total order") {
    val order = Seq(col("v").asc, col("id").asc)
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val got = Ranking.globalRowNumber(df, order, "rn", numPartitions = 5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got === expected)
  }

  test("ntileGlobal matches ntile() exactly: uneven buckets, desc keys, n < buckets") {
    val order = Seq(col("v").desc, col("id").asc)
    for (b <- Seq(2, 4, 7, 103, 200)) {
      val expected = df.withColumn("q",
          ntile(b).over(Window.orderBy(order: _*)).cast("long"))
        .orderBy("id").collect().map(_.toSeq).toSeq
      val got = Ranking.ntileGlobal(df, b, order, "q", numPartitions = 5)
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(got === expected, s"buckets=$b")
    }
  }

  test("results are stable across runs and partition counts") {
    val order = Seq(col("v").asc, col("id").asc)
    val a = Ranking.ntileGlobal(df, 4, order, "q", numPartitions = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Ranking.ntileGlobal(df, 4, order, "q", numPartitions = 9)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  // Non-null route keys (the keyed contract): w in [0,6], heavy ties.
  private def keyedDf = {
    import spark.implicits._
    (1 to 103).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "w")
  }

  test("ntileGlobalKeyed matches ntile() under any boundary set — balance only") {
    val expected = keyedDf.withColumn("q",
        ntile(4).over(Window.orderBy(col("w").asc, col("id").asc)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val boundarySets = Seq(
      Seq(1.5, 3.5, 5.5),            // well-placed
      Seq(0.0, 2.0, 4.0),            // ON tie values (equal keys co-route)
      Seq(2.0, 2.0, 2.0, 100.0),     // duplicates + one empty tail range
      Seq(-10.0),                    // everything lands in one partition
      Nil)                           // single partition, sizes job path
    for (bs <- boundarySets) {
      val got = Ranking.ntileGlobalKeyed(keyedDf, 4, col("w"), col("id"), "q", bs)
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(got === expected, s"bounds=$bs")
    }
  }

  test("ntileGlobalKeyed: empty bounds + knownTotal skips the counting job, same result") {
    val expected = keyedDf.withColumn("q",
        ntile(4).over(Window.orderBy(col("w").asc, col("id").asc)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val got = Ranking.ntileGlobalKeyed(keyedDf, 4, col("w"), col("id"), "q",
        Nil, knownTotal = Some(103L))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got === expected)
  }

  test("ntileGlobalKeyed: descending metrics route on exact negation") {
    val expected = keyedDf.withColumn("q",
        ntile(3).over(Window.orderBy(col("w").desc, col("id").asc)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val got = Ranking.ntileGlobalKeyed(keyedDf, 3,
        -col("w").cast("double"), col("id"), "q", Seq(-5.5, -2.5))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got === expected)
  }

  test("ntileGlobalKeyed: all-equal route keys (giant tie group) still exact") {
    import spark.implicits._
    val flat = (1 to 50).map(i => (i.toLong, 7.0)).toDF("id", "w")
    val expected = flat.withColumn("q",
        ntile(4).over(Window.orderBy(col("w").asc, col("id").asc)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    val got = Ranking.ntileGlobalKeyed(flat, 4, col("w"), col("id"), "q",
        Seq(1.0, 7.0, 9.0))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got === expected)
  }

  test("ntileChainSmall is bit-identical to the chained keyed form") {
    import spark.implicits._
    // Ties in both metrics, a descending member, uneven buckets (n=23,
    // b=4), multiple input partitions (coalesce path exercised).
    val t = (1 to 23).map(i => (i.toLong, (i % 5).toDouble, (i % 3).toLong))
      .toDF("id", "w", "c").repartition(4)
    val specs = Seq(
      (col("w"), col("id"), "qw"),
      (-col("c").cast("double"), col("id"), "qc"))
    val chained = {
      val a = Ranking.ntileGlobalKeyed(t, 4, specs(0)._1, specs(0)._2, "qw",
        Nil, knownTotal = Some(23L))
      Ranking.ntileGlobalKeyed(a, 4, specs(1)._1, specs(1)._2, "qc",
        Nil, knownTotal = Some(23L))
    }.orderBy("id").collect().map(_.toSeq).toSeq
    val small = Ranking.ntileChainSmall(t, 4, specs)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(small === chained)
    // and both match the window ntile on each member's own order
    val win = t
      .withColumn("qw", ntile(4).over(
        Window.orderBy(col("w").asc, col("id").asc)).cast("long"))
      .withColumn("qc", ntile(4).over(
        Window.orderBy(col("c").desc, col("id").asc)).cast("long"))
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(small === win)
  }
}
