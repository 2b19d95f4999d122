package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Regression net for BUILD-SIDE choices that only hurt at scale: with
  * auto-broadcast disabled (so every BroadcastExchange in the plan is
  * one we asked for) and AQE off (so the compile-time plan is the
  * final plan), assert which side of each join is broadcast.
  *
  * The q17 case is the motivating bug: without hints Catalyst happily
  * broadcasts the pruned LINEITEM fact scan itself (it fits the static
  * 10 MB threshold at bench scale — and OOMs at real scale); the
  * per-part aggregate and the part dim are the sides that STAY small
  * at any scale factor, so those must be the build sides. */
class JoinShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withStaticPlans[A](body: => A): A = {
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def broadcasts(name: String): Seq[BroadcastExchangeExec] =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan
      .collect { case b: BroadcastExchangeExec => b }

  test("q17 broadcasts the per-part aggregate and the part dim — never raw lineitem") {
    withStaticPlans {
      val bes = broadcasts("q17_below_avg")
      assert(bes.size == 2, s"expected exactly the two hinted broadcasts, got ${bes.size}")
      bes.foreach { b =>
        val sub = b.child.toString
        val isPartAgg = sub.contains("HashAggregate") && sub.contains("lineitem.parquet")
        val isPartDim = sub.contains("part.parquet") && !sub.contains("lineitem.parquet")
        assert(isPartAgg || isPartDim,
          s"unexpected broadcast build side (raw fact-table broadcast?):\n$sub")
      }
    }
  }

  test("contamination broadcasts the distinct benchmark n-gram set only") {
    withStaticPlans {
      val bes = broadcasts("q_contamination")
      assert(bes.size == 1, s"expected one hinted broadcast, got ${bes.size}")
      val sub = bes.head.child.toString
      assert(sub.contains("HashAggregate"), // the distinct() of bench n-grams
        s"broadcast side should be the distinct bench n-gram set:\n$sub")
    }
  }

  test("duplicate-span join deliberately does NOT broadcast (span set is corpus-sized)") {
    withStaticPlans {
      assert(broadcasts("q_dup_spans").isEmpty)
    }
  }
}
