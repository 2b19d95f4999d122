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
}
