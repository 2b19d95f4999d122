package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSimilarityExpr, DotProductExpr, L2DistanceExpr}
import graft.index.IvfIndex

/** Opt-in optimizer rule: `ORDER BY cosine(vec, <literal qv>) DESC
  * LIMIT k` over a registered IVF-clustered store is rewritten into the
  * same query over only the `nprobe` clusters nearest to qv — the
  * driver computes the probe set from the (tiny) centroid table and
  * injects `WHERE cluster IN (...)` directly above the scan, where it
  * becomes partition pruning on a `partitionBy("cluster")` layout
  * (SURVEY §4 "optional future rule"; the manual form of this pruning
  * is q_ivf_search / DocumentStore's IVF path).
  *
  * This trades recall for scan cost exactly like FAISS IVF search
  * (reference: src/langchain_memvid/index.py:239-291), so it is DOUBLY
  * opt-in: the store must be registered via [[IvfTopKPruneRule.register]]
  * AND `spark.graft.ivf.autoPrune` must be `true`. Everything else —
  * any un-registered scan, ascending sorts, non-literal queries — is
  * left untouched.
  *
  * DEFAULT DECISION (r15, closing the item carried since r13): opt-in
  * is PERMANENT. This is not caution pending more parity testing —
  * six rounds of parity specs say the rewrite fires correctly — it is
  * semantics: the rule changes query RESULTS (approximate top-k in
  * place of exact) rather than just the plan, and Catalyst rules that
  * alter results may only fire under an explicit per-session request.
  * Were the conf default true, `register()` alone — a store-lifecycle
  * call made by ingest code — would silently flip every exact scan
  * over that path to approximate for all readers of the session,
  * including ones that never heard of IVF (exactly the
  * accuracy-changing class Spark itself gates behind explicit confs,
  * e.g. legacy interval arithmetic). Callers who want always-on
  * pruning say so once per session (`spark.conf.set(ConfKey, true)`),
  * which is the intended deployment for an ANN-serving session; mixed
  * exact/approximate sessions keep the conf off and use the
  * DocumentStore IVF search path, which is approximate BY NAME at the
  * call site. The kill-switch question is therefore moot: the conf IS
  * the switch, and its safe side is the default.
  */
object IvfTopKPruneRule {

  val ConfKey = "spark.graft.ivf.autoPrune"

  final case class Registration(model: IvfIndex.Model, clusterCol: String, nprobe: Int)

  private val registry = TrieMap.empty[String, Registration]

  private def normalize(path: String): String = {
    // Canonicalize through Hadoop Path so every spelling of the same
    // location keys identically: the old literal stripPrefix("file:")
    // left "file:///x" as "///x" while the scan's rootPath rendered
    // "file:/x" -> "/x" — the lookup never matched and the opt-in
    // rewrite silently never fired (the silent-disable class). Local
    // paths reduce to their path part; remote URIs (hdfs://host/...)
    // keep scheme + authority.
    val p = new org.apache.hadoop.fs.Path(path)
    val uri = p.toUri
    val rendered = if (uri.getScheme == "file") uri.getPath else p.toString
    rendered.replaceAll("/+$", "")
  }

  /** Declare that the parquet store at `path` carries an IVF `clusterCol`
    * assigned by `model`, and that ANN top-k over it may probe `nprobe`
    * clusters. */
  def register(path: String, model: IvfIndex.Model, nprobe: Int,
               clusterCol: String = "cluster"): Unit =
    registry.put(normalize(path), Registration(model, clusterCol, nprobe))

  def unregister(path: String): Unit = registry.remove(normalize(path))

  private[plans] def lookup(paths: Seq[String]): Option[Registration] =
    paths.map(normalize).flatMap(registry.get).headOption

  private[plans] def isEmpty: Boolean = registry.isEmpty

  /** qv literal of an `array<double>` expression (through casts). */
  private def literalVec(e: Expression): Option[Seq[Double]] = e match {
    case Literal(ad: ArrayData, ArrayType(DoubleType, _)) => Some(ad.toDoubleArray.toSeq)
    case Cast(child, _, _, _) => literalVec(child)
    case _ => None
  }

  /** Match metric(vec, literal) in either argument order, optionally
    * wrapped in round(_, scale) (VectorIndex.topK's roundScale), for
    * all three graft metrics. Returns (query vector, the NON-literal
    * side, higherIsBetter) — the caller must verify the non-literal
    * side actually reads the registered store's vector column (or the
    * rule would prune scans that the ranking never scores) AND that
    * the sort direction matches the metric's better-direction
    * (descending cosine/ip, ASCENDING l2 distance). */
  private[plans] def scoreQueryVec(e: Expression): Option[(Seq[Double], Expression, Boolean)] =
    e match {
      case Round(child, _, _) => scoreQueryVec(child)
      case CosineSimilarityExpr(l, r) => matchSides(l, r, higherIsBetter = true)
      case DotProductExpr(l, r)       => matchSides(l, r, higherIsBetter = true)
      case L2DistanceExpr(l, r)       => matchSides(l, r, higherIsBetter = false)
      case _ => None
    }

  private def matchSides(l: Expression, r: Expression,
                         higherIsBetter: Boolean): Option[(Seq[Double], Expression, Boolean)] =
    literalVec(r).map(v => (v, l, higherIsBetter))
      .orElse(literalVec(l).map(v => (v, r, higherIsBetter)))

  /** Batch twin of [[scoreQueryVec]]: metric(l, r) with BOTH sides
    * non-literal (the multi-query shape — the query vector is a column
    * of the queries side, not a literal). Returns (l, r,
    * higherIsBetter); the caller decides which side is the store's
    * vector and which is the query by reference-set membership. */
  private[plans] def scoreSides(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case Round(child, _, _) => scoreSides(child)
      case CosineSimilarityExpr(l, r) => Some((l, r, true))
      case DotProductExpr(l, r)       => Some((l, r, true))
      case L2DistanceExpr(l, r)       => Some((l, r, false))
      case _ => None
    }
}

case class IvfTopKPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import IvfTopKPruneRule._

  private def enabled: Boolean =
    spark.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true"))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || IvfTopKPruneRule.isEmpty) plan
    else plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(SortOrder(scoreAttr: Attribute, dir, _, _) +: _, true, child, _)))
          if dir == Descending || dir == Ascending =>
        pruned(scoreAttr, child, wantHigher = dir == Descending)
          .map(c => gl.copy(child = ll.copy(child = sort.copy(child = c))))
          .getOrElse(gl)
      // The window shape only fires under an upper-bounding rank
      // filter (the top-k that sanctions the recall trade): a bare
      // per-query ranking with no rank<=k above it asked for the FULL
      // ordering, and pruning it would silently delete ~(1 -
      // nprobe/nlist) of the output rows — row loss, not a recall
      // trade. (The aggregate shapes are inherently k-bounded.)
      case f @ Filter(cond, w: Window) if rankUpperBounded(cond, w) =>
        prunedBatch(w).map(c => f.copy(child = c)).getOrElse(f)
      case f @ Filter(cond, p @ Project(_, w: Window)) if rankUpperBounded(cond, w) =>
        prunedBatch(w).map(c => f.copy(child = p.copy(child = c))).getOrElse(f)
      case a: Aggregate => prunedBatchAgg(a).getOrElse(a)
    }

  /** Does `cond` upper-bound a rank-like output of `w` against a
    * literal (rank <= k / rank < k / rank = k, either operand order)?
    * Only TOP-LEVEL CONJUNCTS count: a bounding comparison buried under
    * an Or/Not (e.g. `rank <= 10 OR pinned`, `NOT(rank <= 10)`) does
    * NOT bound the output to top-k, and sanctioning the prune there
    * would silently delete the rows the disjunction/negation keeps —
    * the exact row-loss class this guard exists to close. */
  private def rankUpperBounded(cond: Expression, w: Window): Boolean = {
    val rankAttrs = w.windowExpressions.collect {
      case a @ Alias(WindowExpression(_: RowNumber | _: Rank | _: DenseRank, _), _) =>
        a.exprId
    }.toSet
    if (rankAttrs.isEmpty) return false
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).exists {
      case LessThanOrEqual(attr: Attribute, _: Literal) => rankAttrs(attr.exprId)
      case LessThan(attr: Attribute, _: Literal) => rankAttrs(attr.exprId)
      case EqualTo(attr: Attribute, _: Literal) => rankAttrs(attr.exprId)
      case EqualTo(_: Literal, attr: Attribute) => rankAttrs(attr.exprId)
      case GreaterThanOrEqual(_: Literal, attr: Attribute) => rankAttrs(attr.exprId)
      case GreaterThan(_: Literal, attr: Attribute) => rankAttrs(attr.exprId)
      case _ => false
    }
  }

  /** Batch (multi-query) pruning: `VectorIndex.topKBatch`'s shape — a
    * per-query ranking window over metric(store vec, query vec column)
    * of a scored cross join — is rewritten to probe only each query's
    * `nprobe` nearest clusters: the probe set is computed ONCE per
    * query row by projecting [[graft.functions.NearestCentroidsExpr]]
    * onto the (small, broadcast) queries side, and
    * `array_contains(probes, cluster)` is filtered directly above the
    * join, cutting the ranking/shuffle input to ~nprobe/nlist of the
    * scored pairs. The probe set is bit-identical to the driver-side
    * `Model.nearestCentroids` path (same rounding and index tie-break),
    * so this is the single-query rewrite's recall trade, per query.
    *
    * Fires only when ALL of: the window has a rank-like function
    * partitioned by something from the queries side and ordered first
    * by the score; the score aliases metric(l, r) with the vector side
    * reading a REGISTERED store scan whose cluster column survives to
    * the join output; the query side is `array<double>`; the sort
    * direction matches the metric; and no cluster filter exists yet
    * (idempotence — also what stops the second window of the same
    * tower from re-firing). */
  private def prunedBatch(w: Window): Option[LogicalPlan] = {
    val rankLike = w.windowExpressions.exists {
      case Alias(WindowExpression(_: RowNumber | _: Rank | _: DenseRank, _), _) => true
      case _ => false
    }
    if (!rankLike) return None
    val scoreOrder = w.orderSpec.headOption.collect {
      case SortOrder(a: Attribute, dir, _, _) if dir == Descending || dir == Ascending =>
        (a, dir == Descending)
    }
    scoreOrder.flatMap { case (scoreAttr, wantHigher) =>
      resolveAlias(w.child, scoreAttr)
        .flatMap(scoreSides).filter(_._3 == wantHigher)
        .flatMap { case (l, r, _) =>
          pruneAboveJoin(w.child, l, r,
            qSide => w.partitionSpec.exists(
              _.references.exists(qSide.outputSet.contains)))
            .map(newChild => w.copy(child = newChild))
        }
    }
  }

  /** Aggregate twin of [[prunedBatch]] — `VectorIndex.topKBatch`'s
    * partial-aggregate shapes: a grouped [[graft.functions.BoundedTopKAgg]]
    * (k > 1) or `min_by` (k = 1) whose ordering struct leads with the
    * score (negated when higher-is-better, verbatim when
    * lower-is-better), grouped by something from the queries side of a
    * scored join over a registered store. Same probes-column rewrite,
    * same recall trade, same idempotence guard. */
  private def prunedBatchAgg(a: Aggregate): Option[LogicalPlan] = {
    val ordHead = a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case graft.functions.BoundedTopKAgg(s: CreateNamedStruct, _, _, _, _) =>
          s.valExprs.headOption
        // topKBatch materializes the candidate struct in a codegen'd
        // Project below the aggregate (so the agg's per-row eval is an
        // UnsafeRow view) — chase the attribute to its defining alias.
        case graft.functions.BoundedTopKAgg(attr: Attribute, _, _, _, _) =>
          resolveAlias(a.child, attr) match {
            case Some(s: CreateNamedStruct) => s.valExprs.headOption
            case _ => None
          }
        case MinBy(_, s: CreateNamedStruct) => s.valExprs.headOption
        case _ => None
      }
    }).flatten.headOption
    ordHead.flatMap { head =>
      val (scoreExpr, wantHigher) = head match {
        case UnaryMinus(e, _) => (e, true)
        case e => (e, false)
      }
      val resolved = scoreExpr match {
        case attr: Attribute => resolveAlias(a.child, attr)
        case other => Some(other)
      }
      resolved.flatMap(scoreSides).filter(_._3 == wantHigher)
        .flatMap { case (l, r, _) =>
          pruneAboveJoin(a.child, l, r,
            qSide => a.groupingExpressions.exists(
              _.references.exists(qSide.outputSet.contains)))
            .map(newChild => a.copy(child = newChild))
        }
    }
  }

  /** The expression a `scoreAttr` aliases in the Projects below.
    * Collects ALL Projects — a collectFirst on the outer Project would
    * stop at the first one even when the score alias lives in a deeper
    * projection that CollapseProject declined to merge. */
  private def resolveAlias(child: LogicalPlan, scoreAttr: Attribute): Option[Expression] =
    child.collect { case Project(pl, _) => pl }.flatten
      .collectFirst { case al @ Alias(e, _) if al.exprId == scoreAttr.exprId => e }

  /** Shared rewrite core for the batch shapes: locate the scored join
    * under `child`, verify one metric side reads a REGISTERED store
    * scan and the other an `array<double>` queries side that the
    * consumer is per-query over (`perQueryOf`), then project each
    * query's probe set onto the queries side and filter the join on
    * `array_contains(probes, cluster)`. Returns `child` with the join
    * replaced, or None when any guard fails. */
  private def pruneAboveJoin(child: LogicalPlan, l: Expression, r: Expression,
                             perQueryOf: LogicalPlan => Boolean): Option[LogicalPlan] =
    child.collectFirst { case j: Join => j }
      // INNER/CROSS only: the probes filter sits ABOVE the join, so on
      // an outer join it would also delete null-extended rows (a query
      // with no surviving match loses its row entirely — changed join
      // semantics, not the sanctioned recall trade).
      .filter(j => j.joinType == org.apache.spark.sql.catalyst.plans.Inner ||
        j.joinType == org.apache.spark.sql.catalyst.plans.Cross)
      .flatMap { join =>
      // collect ALL file scans and try EVERY registered one — a
      // collectFirst would stop at whichever parquet relation pre-order
      // reaches first (e.g. an unregistered queries table), and keeping
      // only the FIRST registered one would silently disable the
      // rewrite when two registered stores appear in one plan and the
      // ranking scores the second.
      val scans = join.collect {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          lookup(fs.location.rootPaths.map(_.toString))
            .flatMap(reg => lr.output.find(_.name == reg.clusterCol)
              .map(cl => (lr, reg, cl)))
      }.flatten
      scans.view.flatMap { case (lr, reg, clusterAttr) =>
        // which join child holds the scan — the other is queries
        val scanOnLeft = join.left.collectFirst {
          case l2: LogicalRelation if l2 eq lr => l2 }.isDefined
        val qSide = if (scanOnLeft) join.right else join.left
        // classify the metric's sides by reference sets
        val sides = Seq((l, r), (r, l)).collectFirst {
          case (vec, qv)
              if vec.references.nonEmpty && vec.references.subsetOf(lr.outputSet) &&
                qv.references.nonEmpty && qv.references.subsetOf(qSide.outputSet) &&
                qv.dataType.isInstanceOf[ArrayType] &&
                qv.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
            qv
        }
        val perQuery = perQueryOf(qSide)
        val alreadyPruned = child.exists {
          case Filter(cond, _) => cond.references.contains(clusterAttr)
          case _ => false
        }
        // Column pruning may have dropped the cluster column from
        // the docs-side Projects (the query never selects it) —
        // re-thread it bottom-up so the filter above the join can
        // see it; the tower's own Projects prune it right back
        // above the filter. Bail if something other than Projects
        // (an agg, another join) sits between the scan and the
        // join — threading through those would change semantics.
        val docsSide = if (scanOnLeft) join.left else join.right
        val docsWithCluster = docsSide.transformUp {
          case p: Project
              if !p.projectList.exists(_.toAttribute.exprId == clusterAttr.exprId) &&
                p.child.outputSet.contains(clusterAttr) =>
            p.copy(projectList = p.projectList :+ clusterAttr)
        }
        val clusterReachable = docsWithCluster.outputSet.contains(clusterAttr)
        sides.filter(_ => perQuery && !alreadyPruned && clusterReachable)
          .map { qv =>
            val probesAlias = Alias(
              graft.functions.NearestCentroidsExpr(
                qv, reg.model.centroids, reg.nprobe, roundScale = -1),
              "__graft_probes")()
            val newQSide = Project(qSide.output :+ probesAlias, qSide)
            val newJoin =
              if (scanOnLeft) join.copy(left = docsWithCluster, right = newQSide)
              else join.copy(left = newQSide, right = docsWithCluster)
            val filtered = Filter(
              ArrayContains(probesAlias.toAttribute, clusterAttr), newJoin)
            child.transformUp { case j2: Join if j2 eq join => filtered }
          }
      }.headOption
    }

  /** Rewrites `child` with a cluster-IN-probes filter above its scan if
    * (a) `scoreAttr` is an alias of cosine(vec, literal qv) somewhere in
    * `child`, (b) the scan underneath is a registered IVF store whose
    * cluster column it outputs, (c) the cosine's vector side actually
    * READS that scan (its attribute references resolve to the scan's
    * output — without this, a ranking over some OTHER table's vectors
    * joined with the store would wrongly prune store rows), and (d) no
    * cluster filter is present yet (rule idempotence under fixed-point
    * batches). */
  private def pruned(scoreAttr: Attribute, child: LogicalPlan,
                     wantHigher: Boolean): Option[LogicalPlan] = {
    // Collect ALL Projects under the sort (same shape as prunedBatch):
    // a collectFirst on the outer Project would stop at the first one
    // even when the score alias lives in a deeper projection that
    // CollapseProject declined to merge, silently disabling the rewrite.
    val matched = child.collect { case Project(pl, _) => pl }.flatten
      .collectFirst { case a @ Alias(e, _) if a.exprId == scoreAttr.exprId => e }
      .flatMap(scoreQueryVec)
    matched.filter { case (_, _, higherIsBetter) => higherIsBetter == wantHigher }
      .flatMap { case (queryVec, vecSide, _) =>
      // ALL scans, trying EVERY registered one — see pruneAboveJoin: a
      // collectFirst stops at the first parquet relation in pre-order
      // even when it's not a registered store, and keeping only the
      // first REGISTERED one silently disables the rewrite when the
      // ranking scores a second registered store in the same plan.
      child.collect {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          lookup(fs.location.rootPaths.map(_.toString))
            .flatMap { reg =>
              lr.output.find(_.name == reg.clusterCol).map(cl => (lr, reg, cl))
            }
      }.flatten.view.flatMap { case (lr, reg, clusterAttr) =>
        val readsThisScan = vecSide.references.nonEmpty &&
          vecSide.references.subsetOf(lr.outputSet)
        val alreadyPruned = child.exists {
          case Filter(cond, _) => cond.references.contains(clusterAttr)
          case _ => false
        }
        if (!readsThisScan || alreadyPruned) None
        else {
          val probes = reg.model.nearestCentroids(queryVec, reg.nprobe)
          val filter = In(clusterAttr, probes.map(p => Literal(p)))
          Some(child.transformUp {
            case l: LogicalRelation if l eq lr => Filter(filter, l)
          })
        }
      }.headOption
    }
  }
}
