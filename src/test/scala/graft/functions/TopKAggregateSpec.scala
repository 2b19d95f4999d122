package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.topKStructs

/** BoundedTopKAgg must be bit-identical to the ranking window it
  * replaces — across partial/final merges (many input partitions),
  * group sizes below k, ties resolved by the tie-break field, null
  * keys, and string order fields. */
class TopKAggregateSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(topKStructs(struct(
        negate(col("score")).as("__o0"), col("id").as("__o1"),
        struct(col("g"), col("score"), col("id")).as("__row")), k, 2).as("t"))
      .select(posexplode(col("t")).as(Seq("p", "e")))
      .select(col("e.__row.g").as("g"), col("e.__row.score").as("score"),
        col("e.__row.id").as("id"), (col("p") + 1).cast("int").as("rank"))

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("g", "score", "id", "rank")
  }

  test("grouped top-k matches the ranking window across partial merges") {
    import spark.implicits._
    // Heavy ties (11 distinct scores over 500 rows) and 13 input
    // partitions so map-side partials MUST merge correctly.
    val df = (1 to 500).map(i =>
        ((i % 7).toLong, ((i * 37) % 11).toDouble / 10.0, i.toLong))
      .toDF("g", "score", "id").repartition(13)
    for (k <- Seq(1, 5, 80)) { // 80 > the ~71-row groups: whole group kept
      val expected = windowed(df, k).orderBy("g", "rank").collect().map(_.toSeq).toSeq
      val got = topk(df, k).orderBy("g", "rank").collect().map(_.toSeq).toSeq
      assert(got === expected, s"k=$k")
    }
  }

  test("null order keys rank first — same as the window's asc nulls-first") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double, Long)](
      (0L, 1.0, 1L), (0L, null, 2L), (0L, 3.0, 3L), (0L, null, 4L))
      .toDF("g", "v", "id")
    // asc on v (no negate): nulls first, then values; ties by id.
    val got = df.groupBy(col("g"))
      .agg(topKStructs(struct(col("v").as("__o0"), col("id").as("__o1"),
        struct(col("id")).as("__row")), 3, 2).as("t"))
      .select(posexplode(col("t")).as(Seq("p", "e")))
      .select(col("e.__row.id")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 4L, 1L))
  }

  test("string order fields compare binary, like Spark sort") {
    import spark.implicits._
    val df = Seq((0L, "b", 1L), (0L, "A", 2L), (0L, "a", 3L), (0L, "B", 4L))
      .toDF("g", "s", "id")
    val got = df.groupBy(col("g"))
      .agg(topKStructs(struct(col("s").as("__o0"), col("id").as("__o1"),
        struct(col("id")).as("__row")), 2, 2).as("t"))
      .select(posexplode(col("t")).as(Seq("p", "e")))
      .select(col("e.__row.id")).collect().map(_.getLong(0)).toSeq
    val expected = df.orderBy(col("s").asc, col("id").asc).limit(2)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }

  test("-0.0 and 0.0 compare EQUAL (SQLOrderingUtil semantics) so k=1 and k>1 paths agree") {
    import spark.implicits._
    // Keys -0.0 vs 0.0: Spark's interpreted struct ordering (min_by,
    // the k=1 path of topKBatch) treats them equal post-SPARK-32110, so
    // the id tie-break must decide — a bare Double.compare would rank
    // -0.0 strictly first and let the two paths return different
    // winners for the same input.
    val df = Seq(
      (0L, 0.0, 10L),    // +0.0, lower id
      (0L, -0.0, 20L))   // -0.0, higher id
      .toDF("g", "score", "id").repartition(2)
    val top1 = df.groupBy(col("g"))
      .agg(topKStructs(struct(col("score").as("__o0"), col("id").as("__o1"),
        struct(col("id")).as("__row")), 1, 2).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.__row.id"))
      .as[Long].head()
    val viaMinBy = df.groupBy(col("g"))
      .agg(min_by(col("id"), struct(col("score"), col("id"))).as("id"))
      .select("id").as[Long].head()
    assert(top1 == viaMinBy, s"agg=$top1 min_by=$viaMinBy")
    assert(top1 == 10L) // ids break the tie; -0.0 does not outrank +0.0
  }

  test("rejects non-struct input and unorderable key fields at analysis") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0), 1L)).toDF("g", "arr", "id")
    val e1 = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(topKStructs(col("id"), 2, 1)).collect()
    }
    assert(e1.getMessage.contains("struct"))
    val e2 = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(topKStructs(struct(col("arr").as("__o0"),
          struct(col("id")).as("__row")), 2, 1)).collect()
    }
    assert(e2.getMessage.contains("unsupported") ||
      e2.getMessage.contains("__o0"))
  }
}
