package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational mutation primitives — MERGE/upsert and CDC-apply as
  * copy-on-write set algebra (the reference mutates via full rebuilds,
  * vectorstore.py:469-537; the Spark shape is an anti-join + union that
  * rewrites only what a snapshot write must rewrite anyway).
  */
object Mutations {

  /** MERGE (upsert): every `batch` row lands in the result ("when
    * matched then update, when not matched then insert"); `target` rows
    * whose key the batch doesn't carry pass through unchanged.
    *
    * One left_anti join + union — no per-row point writes. The join
    * shuffles on the key at scale (Catalyst broadcasts the batch side
    * when it's small); with both sides bucketed on the key it's
    * exchange-free. Column sets must match (`unionByName`).
    *
    * Keys compare NULL-SAFELY (`<=>`): null is a legitimate key VALUE
    * here, so a null-key batch row REPLACES the null-key target row —
    * a plain equi-anti-join never matches NULL and would keep both
    * (silent duplication on every upsert of that row).
    *
    * If `batch` carries duplicate keys the result keeps them all —
    * pre-aggregate the batch (e.g. latest by timestamp) when the key
    * must stay unique. */
  def upsert(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    val keysDf = batch.select(keys.map(col): _*).distinct()
    batch.unionByName(antiJoinOnKeys(target, keysDf, keys))
  }

  /** `target LEFT ANTI JOIN keysDf` on null-safe key equality, with the
    * condition built from EXPLICITLY ALIASED frames. When the batch
    * derives from the target (the common incremental shape — see
    * MutationsSpec), `target(k) <=> keysDf(k)` resolves both sides to
    * the SAME attribute and leans on Spark's ambiguous-self-join repair
    * (it logs "Constructing trivially true equals predicate" and fixes
    * the condition up from dataset-id metadata — an analyzer heuristic,
    * `spark.sql.analyzer.failAmbiguousSelfJoin` territory). Qualified
    * references resolve per side AFTER relation deduplication, so the
    * plan is unambiguous by construction, no repair involved. */
  private def antiJoinOnKeys(target: DataFrame, keysDf: DataFrame,
                             keys: Seq[String]): DataFrame = {
    val t = target.alias("__graft_merge_t")
    val b = keysDf.alias("__graft_merge_b")
    val cond = keys.map(k =>
        col(s"__graft_merge_t.`$k`") <=> col(s"__graft_merge_b.`$k`"))
      .reduce(_ && _)
    t.join(b, cond, "left_anti")
  }

  /** Latest change per key: keeps the row that is greatest under
    * `orderCols` (descending, in order — make the combination unique,
    * e.g. (ts, sequence_id), for full determinism). The documented
    * pre-aggregation for [[upsert]]/[[applyCdc]] when a change batch
    * can carry several versions of one key: one key-partitioned window
    * (single shuffle), no join. */
  def latestByKey(changes: DataFrame, keys: Seq[String],
                  orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** CDC apply: `changes` carries an operation column (`opCol`) whose
    * value `"delete"` removes the key from the target; every other
    * value upserts the row. The Delta-style
    * whenMatchedDelete/whenMatchedUpdate/whenNotMatchedInsert MERGE,
    * as one anti-join + union: any touched key leaves the target, and
    * the non-delete change rows come back in. Keys compare NULL-SAFELY
    * like [[upsert]]'s — a null-key delete actually deletes and a
    * null-key update replaces, instead of silently no-opping through a
    * null-rejecting equi-join (which would also make the streaming
    * [[graft.streaming.StreamingOps]] CDC sink accumulate a duplicate
    * null-key row per micro-batch). */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String = "op"): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    // Null-safe: a NULL op is "not delete" and must upsert — a bare
    // =!= would evaluate to NULL and silently DROP the row while its
    // key still anti-joins the target (a malformed CDC record would
    // delete data).
    val upserts = changes
      .where(col(opCol).isNull || col(opCol) =!= "delete").drop(opCol)
    upserts.unionByName(antiJoinOnKeys(target, touched, keys))
  }
}
