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

  // EVERY query in the suite is gated (round-11: the gate used to cover
  // the 22 most-expensive families; auditing the rest surfaced two
  // batch-scaled forced broadcasts in Dedup, so the blanket gate earns
  // its test time). Building the DataFrame at sf0.001 is cheap and
  // yields the same plan SHAPE as sf0.1 (the shapes audited here are
  // scale-invariant by design); store-building builders run their small
  // build jobs once.
  //
  // Allowlist: violations that are CONTRACT-bounded — the plan cannot
  // show the bound, the API can. Each entry names the audit substring
  // it excuses and why the shape is safe at any corpus size.
  private val contractBounded: Map[String, String] = Map(
    // topKBatch's fan-out broadcasts the QUERY batch against the corpus
    // scan (VectorIndex.scala: docs.crossJoin(broadcast(queries))) — a
    // kNN batch is executor-memory-bounded by the operator's documented
    // contract; the audit sees only that the bench derives the batch
    // from an embeddings-table filter.
    "q_knn_batch" -> "broadcast of unbounded side (embeddings)",
    "q_knn_self_top1" -> "broadcast of unbounded side (embeddings)",
    // The enrichment side is documents filtered to the k COLLECTED hit
    // ids (isin over a literal id list, doc_id unique) — <= k rows by
    // construction, invisible to the reachability walk.
    "q_enrichment_join" -> "broadcast of unbounded side (documents)")

  for (name <- graft.SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name plan has no scale-killing shape") {
      withStaticPlans {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val bad = PlanAudit.audit(df)
        val unexcused = contractBounded.get(name) match {
          case Some(allowed) => bad.filterNot(_.contains(allowed))
          case None          => bad
        }
        assert(unexcused.isEmpty, s"$name: ${unexcused.mkString("; ")}")
      }
    }

  // --- the gate must catch injected regressions ---------------------

  private def lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
  private def nation = spark.read.parquet(s"$dir/nation.parquet")

  test("auditor flags a cartesian product of two unbounded sides") {
    withStaticPlans {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val bad = PlanAudit.audit(lineitem.crossJoin(orders))
      assert(bad.exists(_.startsWith("CartesianProduct")), bad.mkString("; "))
    }
  }

  test("auditor allows a cartesian with a bounded side (nested-loop broadcast shape)") {
    withStaticPlans {
      // One-row totals aggregate cross-joined onto the fact stream —
      // the q11/q15 shape. Linear, not quadratic: only flagged pre-
      // refinement because the audit's broadcast-off confs force the
      // nested-loop join to plan as CartesianProductExec.
      val totals = lineitem.agg(count(lit(1)).as("n"))
      assert(PlanAudit.audit(lineitem.crossJoin(totals)).isEmpty)
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
