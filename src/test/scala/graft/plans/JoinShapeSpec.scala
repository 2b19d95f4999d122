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

  test("q17 carries NO forced broadcasts: every side grows with scale (AQE sizes at runtime)") {
    withStaticPlans {
      // The per-part aggregate and the part dim both grow linearly
      // with part-key cardinality, so the old hard hints on them would
      // OOM a forced build side at 100 TB. With no hints and
      // auto-broadcast disabled the static plan must contain ZERO
      // BroadcastExchange nodes — under the shipped AQE defaults the
      // small side still gets broadcast at runtime from MEASURED size,
      // which is the legitimate, scale-correct decision (and can never
      // pick raw lineitem once it outgrows the threshold).
      val bes = broadcasts("q17_below_avg")
      assert(bes.isEmpty,
        s"q17 must not force any broadcast:\n${bes.map(_.child.toString).mkString}")
    }
  }

  test("q16's NOT IN carries no forced broadcast (exclusion set grows with supplier)") {
    withStaticPlans {
      val bes = broadcasts("q16_supplier_cnt")
      assert(bes.isEmpty,
        s"q16 must not force any broadcast:\n${bes.map(_.child.toString).mkString}")
    }
  }

  test("contamination carries NO forced broadcast (bench-set size is a contract, not a plan fact)") {
    withStaticPlans {
      // r13 (with the grouped-agg plan-audit hardening): the bench
      // n-gram set's smallness is an eval-set CONTRACT the plan cannot
      // verify — a forced build side would OOM every executor if an
      // eval set ever weren't small. The static plan is an honest
      // shuffle join; under the shipped AQE defaults the measured-small
      // side still broadcasts at runtime (the q17 pattern).
      val bes = broadcasts("q_contamination")
      assert(bes.isEmpty,
        s"contamination must not force any broadcast:\n${bes.map(_.child.toString).mkString}")
    }
  }

  test("duplicate-span join deliberately does NOT broadcast (span set is corpus-sized)") {
    withStaticPlans {
      assert(broadcasts("q_dup_spans").isEmpty)
    }
  }

  private def executed(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def parquetScans(plan: org.apache.spark.sql.execution.SparkPlan,
                           table: String) =
    plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.mkString.contains(s"$table.parquet") => s
    }

  test("q21 is one pass: lineitem scanned ONCE, stats from a single Window") {
    withStaticPlans {
      val plan = executed("q21_waiting_suppliers")
      assert(parquetScans(plan, "lineitem").size == 1,
        s"per-order stats must reuse the joined pass, not rescan lineitem:\n$plan")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.size == 1,
        s"both collect_set stats must fuse into one Window exec, got ${windows.size}")
      assert(broadcasts("q21_waiting_suppliers").isEmpty,
        "q21 carries no broadcast hints (orders/supplier grow with data)")
    }
  }

  test("q4's EXISTS is a semi join and the quarter filter reaches the orders scan") {
    withStaticPlans {
      val plan = executed("q4_order_priority")
      val semis = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, s"expected a LeftSemi SMJ with broadcasts off:\n$plan")
      val ordersScan = parquetScans(plan, "orders").head
      val pushed = ordersScan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
        pushed.contains("LessThan(o_orderdate"),
        s"quarter bounds must push into the orders parquet scan, got: $pushed")
    }
  }

  test("q8 broadcasts only the fixed-size nation/region dims") {
    withStaticPlans {
      val bes = broadcasts("q8_market_share")
      assert(bes.nonEmpty)
      bes.foreach { b =>
        val sub = b.child.toString
        assert(!Seq("lineitem", "orders.parquet", "customer", "part.parquet",
          "supplier").exists(sub.contains),
          s"only nation/region may be broadcast (growing sides must shuffle):\n$sub")
      }
    }
  }

  test("q9 broadcasts only the nation dim; the four growing joins shuffle") {
    withStaticPlans {
      val bes = broadcasts("q9_profit")
      assert(bes.size == 1, s"expected the one nation hint, got ${bes.size}")
      assert(bes.head.child.toString.contains("nation.parquet"),
        "the broadcast side must be the nation dim")
    }
  }

  test("q15 forces only the 1-row max broadcast; the winner set and scans stream") {
    withStaticPlans {
      // r13: the winners side (~1 row, suppliers tied at max revenue)
      // DERIVES from a grouped agg of lineitem, so its bound is
      // invisible to the plan — its hint is gone (AQE broadcasts it
      // from measured size at runtime). The global-max row keeps its
      // hint: a global aggregate is 1 row BY PLAN SHAPE.
      val bes = broadcasts("q15_top_supplier")
      assert(bes.size == 1, s"expected only the max-row broadcast, got ${bes.size}:" +
        s"\n${bes.map(_.child.toString).mkString}")
      val sub = bes.head.child.toString
      assert(sub.contains("HashAggregate"),
        s"the broadcast side must be the global-max aggregate:\n$sub")
      assert(!sub.contains("supplier.parquet"),
        s"the supplier dim must stream, not broadcast:\n$sub")
    }
  }

  test("DSIR broadcasts only the bounded bucket-ratio/totals tables, never the corpus") {
    withStaticPlans {
      val bes = broadcasts("q_dsir_weights")
      // Hinted sides derive from bucket-keyed aggregates (<= B rows by
      // construction) or the 1-row selection boundary; the corpus
      // bigram stream must never be a build side.
      assert(bes.nonEmpty, "expected the hinted ratio/totals broadcasts")
      bes.foreach { b =>
        val sub = b.child.toString
        assert(sub.contains("HashAggregate") ||
          sub.contains("TakeOrderedAndProject"),
          s"broadcast side must be a bounded aggregate/boundary, not a scan:\n$sub")
      }
    }
  }

  test("DSIR selection has no global window — TakeOrdered boundary only") {
    withStaticPlans {
      val plan = executed("q_dsir_weights")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"q_dsir_weights must not ship a corpus-sized window:\n$plan")
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, "the top-k boundary should plan as TakeOrderedAndProject")
    }
  }

  test("batch kNN ranks inside a bounded aggregate — no window over scored pairs") {
    withStaticPlans {
      val plan = executed("q_knn_batch")
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty,
        s"k>1 batch kNN must not window over every scored (doc, query) pair:\n$plan")
      val objAggs = plan.collect {
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
      }
      assert(objAggs.exists(_.toString.contains("graft_top_k")),
        s"expected the BoundedTopKAgg partial aggregate:\n$plan")
    }
  }

  test("delete-recompaction ranks distributed — no window, a range shuffle instead") {
    withStaticPlans {
      val out = graft.SparkEntry.queries("q_delete_antijoin")(spark, dir)
      assert(out.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty,
        "dense-id recompaction must not rank on a single reducer")
      // The distributed rank runs inside the RDD lineage (behind the
      // LogicalRDD scan): range shuffle -> per-partition sort ->
      // zipWithIndex. Its signature is visible in the lineage string.
      val lineage = out.rdd.toDebugString
      assert(lineage.contains("mapPartitionsWithIndex at Ranking.scala"),
        s"expected the offset-numbering pass in the lineage:\n$lineage")
      assert(lineage.contains("ShuffledRowRDD"),
        s"expected the range-partitioning exchange in the lineage:\n$lineage")
    }
  }

  test("SemDedup's pair join shuffles on the cluster key — neither corpus side broadcasts") {
    withStaticPlans {
      assert(broadcasts("q_semdedup").isEmpty,
        "the within-cluster self-join must be a shuffle join: both sides are corpus-sized")
    }
  }
}
