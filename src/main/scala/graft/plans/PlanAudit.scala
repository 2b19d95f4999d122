package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec,
  GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Mechanized plan-quality gate: walks a physical plan and reports the
  * shapes that are fine at benchmark scale but sink a 1000-executor run
  * at 100 TB. The rules encode lessons this engine has already paid
  * for (the q17 raw-fact broadcast among them) as assertions rather
  * than memory:
  *
  *  1. No `CartesianProductExec` with BOTH sides unbounded — an
  *     all-pairs join over two corpus-sized inputs is quadratic work no
  *     cluster absorbs. A cartesian whose other side is bounded (a
  *     one-row GLOBAL aggregate, a limit, a literal VALUES table) is
  *     the nested-loop form of a broadcast join — linear — and appears
  *     at all only because this audit runs with broadcasts
  *     force-disabled.
  *  2. No unpartitioned `WindowExec` fed by an unbounded input: a
  *     global window moves every row to ONE task.
  *  3. No `BroadcastExchangeExec` whose build side is an unbounded
  *     table scan: the build side ships to every executor and must
  *     stay size-bounded as the corpus grows.
  *
  * "Unbounded" is a reachability check: from the suspect node walk
  * DOWN; crossing a GLOBAL aggregate (empty grouping — at most one
  * row) or a global limit prunes the branch; hitting a
  * `FileSourceScanExec` over one of `unboundedTables` is a violation.
  * A GROUPED aggregate is NOT a barrier for ANY rule (r13; the
  * cartesian rule led in r12): a group-by on a corpus-growing key
  * (per-document stats, per-term counts, a token vocabulary) produces
  * a corpus-growing stream, so "grouped agg feeds a global window /
  * broadcast" is exactly the shape that sinks a 100 TB run once key
  * cardinality follows the data. The allow-shape is what the shipped
  * operators already do by convention: put an explicit `limit` (or a
  * global agg) above the grouped aggregate — `TextAnalysis
  * .vocabCoverage` truncates its vocabulary to topN before ranking,
  * `TextSearch.hybridRrf` limits per source before its fusion window —
  * and the walk prunes at that limit.
  *
  * Run it with AQE and auto-broadcast DISABLED so the compile-time
  * plan is the final plan and every broadcast in it is one the code
  * asked for (runtime AQE conversions are stats-driven and
  * legitimate). */
object PlanAudit {

  /** Tables whose raw row streams grow with the corpus — scans of
    * these must never feed a global window or a broadcast unbarriered. */
  val DefaultUnbounded: Set[String] = Set(
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "part", "supplier")

  /** Only a GLOBAL aggregate (empty grouping — at most one row) or a
    * global limit truly bounds a stream in corpus size; a GROUPED
    * aggregate's key cardinality can grow with the corpus and bounds
    * nothing (see the object scaladoc for the allow-shape). */
  private def isBarrier(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    // NOT LocalLimitExec: a per-partition limit grows with partition
    // count, so a plan's row stream below it is NOT bounded in corpus
    // size — treating it as a barrier would let a broadcast of
    // partitions x N rows pass the gate.
    case _: TakeOrderedAndProjectExec | _: CollectLimitExec |
         _: GlobalLimitExec => true
    case _ => false
  }

  private def segMatch(paths: Seq[String], tables: Set[String]): Option[String] =
    tables.find(t => paths.exists(p =>
      p.endsWith(s"/$t.parquet") || p.contains(s"/$t.parquet/") ||
        p.endsWith(s"/$t") || p.contains(s"/$t/")))

  private def scanOf(p: SparkPlan, tables: Set[String]): Option[String] =
    p match {
      case f: FileSourceScanExec =>
        // Segment-anchored match: "/<t>.parquet" or a "/<t>/" directory
        // component — a bare contains(t + ".parquet") would flag
        // "multipart.parquet" for table "part".
        segMatch(f.relation.location.rootPaths.map(_.toString), tables)
      // A CACHED unbounded table must not audit clean: the in-memory
      // relation is the same corpus-sized stream, just materialized —
      // match its cached plan's own scans (recursing via reachable
      // would wrongly honor barriers above the original scan that the
      // cache has already paid; the BYTES the broadcast/window sees
      // are still unbounded only if an unbounded scan feeds the cached
      // plan without a barrier, so reuse the same reachability walk).
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        val inner = c.relation.cachedPlan
        reachable(inner, tables).headOption
      // DSv2 scans (BatchScanExec) — match on the scan's description,
      // which renders the location for file-based v2 sources; a miss
      // here is a false-CLEAN, the failure mode this gate exists for.
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        segMatch(Seq(b.scan.description()), tables)
      case _ => None
    }

  /** Unbounded-table names reachable from `p` (inclusive) without
    * crossing a stream-reducing barrier ([[isBarrier]]). Subquery
    * results (scalar / IN lists) are bounded by construction and not
    * descended into. */
  private def reachable(p: SparkPlan, tables: Set[String]): Seq[String] =
    if (isBarrier(p)) Nil
    else scanOf(p, tables) match {
      case Some(t) => Seq(t)
      case None    => p.children.flatMap(reachable(_, tables))
    }

  /** Audit one physical plan (including its subquery plans as extra
    * roots). Returns human-readable violations; empty = clean. */
  def audit(plan: SparkPlan,
            unboundedTables: Set[String] = DefaultUnbounded): Seq[String] = {
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreachWithSubqueries {
      case c: CartesianProductExec =>
        val l = reachable(c.left, unboundedTables)
        val r = reachable(c.right, unboundedTables)
        if (l.nonEmpty && r.nonEmpty)
          violations += "CartesianProduct of two unbounded sides " +
            s"(${l.distinct.mkString(",")} x ${r.distinct.mkString(",")})"
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val hit = reachable(w.child, unboundedTables)
        if (hit.nonEmpty)
          violations += s"unpartitioned Window over unbounded input (${hit.distinct.mkString(",")})"
      case b: BroadcastExchangeExec =>
        val hit = reachable(b.child, unboundedTables)
        if (hit.nonEmpty)
          violations += s"broadcast of unbounded side (${hit.distinct.mkString(",")})"
      case _ => ()
    }
    violations.toSeq
  }

  /** Convenience: audit a DataFrame's physical plan. Under AQE the
    * executed plan is a single AdaptiveSparkPlanExec LEAF — traversing
    * it directly would visit nothing and report every plan clean — so
    * the adaptive wrapper is unwrapped to its initial physical plan
    * (the audited shapes are static properties the adaptive re-plan
    * does not introduce). Auto-broadcast-off confs still give the
    * strictest reading for the broadcast check (see scaladoc above). */
  def audit(df: DataFrame): Seq[String] =
    audit(df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    })
}
