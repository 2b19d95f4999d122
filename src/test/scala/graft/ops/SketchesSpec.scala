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
}
