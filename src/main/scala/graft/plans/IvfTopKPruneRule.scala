package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
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
  */
object IvfTopKPruneRule {

  val ConfKey = "spark.graft.ivf.autoPrune"

  final case class Registration(model: IvfIndex.Model, clusterCol: String, nprobe: Int)

  private val registry = TrieMap.empty[String, Registration]

  private def normalize(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

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
    val matched = child.collectFirst {
      case Project(projectList, _) => projectList.collectFirst {
        case a @ Alias(e, _) if a.exprId == scoreAttr.exprId => scoreQueryVec(e)
      }.flatten
    }.flatten
    matched.filter { case (_, _, higherIsBetter) => higherIsBetter == wantHigher }
      .flatMap { case (queryVec, vecSide, _) =>
      child.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          lookup(fs.location.rootPaths.map(_.toString))
            .flatMap { reg =>
              lr.output.find(_.name == reg.clusterCol).map(cl => (lr, reg, cl))
            }
      }.flatten.flatMap { case (lr, reg, clusterAttr) =>
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
      }
    }
  }
}
