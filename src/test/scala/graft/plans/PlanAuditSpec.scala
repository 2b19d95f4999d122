package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The plan-quality gate as a TEST: the most expensive driver-bench
  * queries must produce plans free of the three scale-killing shapes
  * [[PlanAudit]] checks (cartesian product, unpartitioned window over
  * unbounded input, broadcast of an unbounded side) — and the auditor
  * itself must FAIL on deliberately regressed plans, so a green run
  * means the gate works, not that it is blind. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Compile-time plans only: AQE off (the static plan IS the final
    * plan) and auto-broadcast off (every broadcast left is one the code
    * hinted — the ones that must stay corpus-size-bounded). */
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

  // The judge-measured most-expensive bench families, plus the fit
  // queries whose build phase runs driver-side jobs. Building the
  // DataFrame at sf0.001 is cheap and yields the same plan SHAPE as
  // sf0.1 (the shapes audited here are scale-invariant by design).
  private val expensive = Seq(
    "q_knn_classify", "q_bm25_index", "q_dsir_weights", "q_dedup_clusters",
    "q_rfm", "q_ivf_search", "q_ivfpq", "q_hybrid_rrf", "q_dedup_jaccard",
    "q_semdedup",
    // round-7 additions: the new pipeline gates must hold the same bar
    "q_dedup_best", "q_url_dedup", "q_split_groups", "q_drift_psi",
    "q_dedup_boilerplate", "q_retrieval_metrics", "q_quality_topfrac",
    "q_maxsim", "q_normalize_text",
    // round-8: store-surface late interaction (build + search per run),
    // multi-probe SemDeDup (2x candidate volume must stay clean)
    "q_maxsim_store", "q_semdedup2", "q_tuning_curve")

  for (name <- expensive)
    test(s"$name plan has no scale-killing shape") {
      withStaticPlans {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val bad = PlanAudit.audit(df)
        assert(bad.isEmpty, s"$name: ${bad.mkString("; ")}")
      }
    }

  // --- the gate must catch injected regressions ---------------------

  private def lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
  private def nation = spark.read.parquet(s"$dir/nation.parquet")

  test("auditor flags a cartesian product") {
    withStaticPlans {
      val bad = PlanAudit.audit(lineitem.crossJoin(nation))
      assert(bad.exists(_.startsWith("CartesianProduct")), bad.mkString("; "))
    }
  }

  test("auditor is not blinded by AQE: adaptive wrapper is unwrapped") {
    // default confs (AQE on): executedPlan is an AdaptiveSparkPlanExec
    // LEAF — without unwrapping, audit would traverse nothing and pass
    // every plan as clean. The unpartitioned-window shape is
    // conf-independent (a cartesian would be, under default
    // auto-broadcast, rescued into a broadcast nested loop).
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    import org.apache.spark.sql.expressions.Window
    val bad = PlanAudit.audit(
      lineitem.withColumn("rn", row_number().over(Window.orderBy("l_orderkey"))))
    assert(bad.exists(_.contains("unpartitioned Window")), bad.mkString("; "))
  }

  test("auditor flags an unpartitioned window over a raw fact scan") {
    withStaticPlans {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("l_orderkey")
      val bad = PlanAudit.audit(
        lineitem.withColumn("rn", row_number().over(w)))
      assert(bad.exists(_.contains("unpartitioned Window")), bad.mkString("; "))
    }
  }

  test("auditor allows an unpartitioned window over aggregated input") {
    withStaticPlans {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("n")
      val agg = lineitem.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(PlanAudit.audit(agg.withColumn("rn", row_number().over(w))).isEmpty)
    }
  }

  test("auditor flags an explicit broadcast of a raw fact scan") {
    withStaticPlans {
      val n = nation
      val l = lineitem
      val bad = PlanAudit.audit(
        n.join(broadcast(l), n("n_nationkey") === l("l_suppkey")))
      assert(bad.exists(_.contains("broadcast of unbounded side")),
        bad.mkString("; "))
    }
  }

  test("auditor allows broadcasting an aggregate of a fact table") {
    withStaticPlans {
      val per = lineitem.groupBy("l_partkey")
        .agg(avg("l_quantity").as("aq"))
      assert(PlanAudit.audit(
        lineitem.join(broadcast(per), "l_partkey")).isEmpty)
    }
  }

  test("auditor is not blinded by a CACHED fact scan (InMemoryTableScan)") {
    withStaticPlans {
      // cache() replaces the file scan with InMemoryTableScanExec — the
      // same corpus-sized stream, just materialized. Pre-fix scanOf
      // only matched FileSourceScanExec, so this broadcast audited
      // CLEAN: a false-clean from the exact gate built for the q17
      // raw-fact-broadcast lesson.
      val l = lineitem.cache()
      try {
        l.count() // materialize so the plan uses the cached relation
        val n = nation
        val bad = PlanAudit.audit(
          n.join(broadcast(l), n("n_nationkey") === l("l_suppkey")))
        assert(bad.exists(_.contains("broadcast of unbounded side")),
          bad.mkString("; "))
        // an aggregate of the cached scan stays allowed (barrier holds)
        val per = l.groupBy("l_partkey").agg(avg("l_quantity").as("aq"))
        assert(PlanAudit.audit(
          lineitem.join(broadcast(per), "l_partkey")).isEmpty)
      } finally { l.unpersist(); () }
    }
  }
}
