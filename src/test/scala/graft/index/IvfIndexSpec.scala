package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val model = IvfIndex.Model(IndexedSeq(
    IndexedSeq(1.0, 0.0, 0.0),
    IndexedSeq(0.0, 1.0, 0.0),
    IndexedSeq(0.0, 0.0, 1.0)))

  test("assignCol: hand-checked assignments, ties to lowest cluster") {
    val docs = Seq(
      (0L, Seq(0.9, 0.1, 0.0)),   // -> 0
      (1L, Seq(0.1, 0.8, 0.2)),   // -> 1
      (2L, Seq(0.0, 0.1, 1.1)),   // -> 2
      (3L, Seq(0.5, 0.5, 0.0))    // equidistant to 0 and 1 -> 0
    ).toDF("id", "vec")
    val got = docs.withColumn("c", model.assignCol(col("vec"), roundScale = 4))
      .orderBy("id").select("c").as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 0))
  }

  test("fused assignCol == HOF assignColSql on random vectors (rounded and raw)") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 300).map(i =>
      (i.toLong, Seq.fill(3)(rnd.nextDouble() * 2 - 1))).toDF("id", "vec")
    for (rs <- Seq(-1, 4)) {
      val fused = vecs.withColumn("c", model.assignCol(col("vec"), rs))
        .orderBy("id").select("c").as[Int].collect().toSeq
      val hof = vecs.withColumn("c", model.assignColSql(col("vec"), rs))
        .orderBy("id").select("c").as[Int].collect().toSeq
      assert(fused == hof, s"mismatch at roundScale=$rs")
    }
  }

  test("nearestCentroids fails fast on query/centroid dim mismatch") {
    // A longer query would silently rank prefix-only distances (a
    // plausible but wrong probe set); a shorter one would throw a bare
    // IndexOutOfBounds mid-loop. Both must be a clear require instead.
    intercept[IllegalArgumentException] {
      model.nearestCentroids(Seq(1.0, 0.0), 1)
    }
    intercept[IllegalArgumentException] {
      model.nearestCentroids(Seq(1.0, 0.0, 0.0, 0.0), 1)
    }
  }

  test("nearestCentroids agrees with assignCol's nearest at nprobe=1") {
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val q = Seq.fill(3)(rnd.nextDouble() * 2 - 1)
      val viaExpr = Seq((0L, q)).toDF("id", "vec")
        .withColumn("c", model.assignCol(col("vec"), roundScale = 4))
        .select("c").as[Int].head
      assert(model.nearestCentroids(q, 1, roundScale = 4).head == viaExpr)
    }
  }
}
