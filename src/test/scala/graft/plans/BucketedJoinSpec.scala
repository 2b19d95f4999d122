package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join scale play: pre-shuffle both tables
  * ONCE at write time (bucketBy on the join key), then every future
  * equi-join on that key runs with ZERO exchanges — at 100 TB this
  * turns the nightly fact/fact join from the dominant shuffle into a
  * local merge per bucket. This spec proves the plan shape, not just
  * the results: the bucketed join's physical plan must contain no
  * Exchange, the unbucketed twin must contain them, and both joins must
  * return identical results. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-bucket").toString

  test("bucketed tables join with zero exchanges; plain tables shuffle; same results") {
    val n = 10000
    val facts = (0 until n).map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
      .toDF("key", "fact_id", "v")
    val dims = (0 until 2000).map(i => (i.toLong % 500, i.toLong))
      .toDF("key", "dim_id")

    spark.sql("DROP TABLE IF EXISTS facts_b")
    spark.sql("DROP TABLE IF EXISTS dims_b")
    facts.write.bucketBy(8, "key").sortBy("key")
      .option("path", tmp() + "/facts").saveAsTable("facts_b")
    dims.write.bucketBy(8, "key").sortBy("key")
      .option("path", tmp() + "/dims").saveAsTable("dims_b")

    // broadcast would trivially avoid the exchange for the wrong reason;
    // force the shuffle-or-colocate decision.
    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = noBroadcast.keys.map(k => k -> spark.conf.getOption(k)).toMap
    noBroadcast.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val bucketed = spark.table("facts_b").join(spark.table("dims_b"), "key")
        .groupBy("key").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      val plain = facts.join(dims, "key")
        .groupBy("key").agg(sum("v").as("sv"), count(lit(1)).as("n"))

      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

      // bucketed: join needs no exchange; the groupBy on the SAME key
      // reuses the bucketing too — the whole plan is exchange-free.
      assert(exchanges(bucketed) == 0,
        s"bucketed plan should have no exchanges:\n${bucketed.queryExecution.executedPlan}")
      assert(exchanges(plain) > 0, "plain join should shuffle")

      val a = bucketed.collect().map(_.toSeq).toSet
      val b = plain.collect().map(_.toSeq).toSet
      assert(a == b && a.nonEmpty)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
