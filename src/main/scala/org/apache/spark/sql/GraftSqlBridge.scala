package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (Spark 4 wraps Column around ColumnNode; the classic converter lives
  * behind `org.apache.spark.sql.classic.ExpressionUtils`). Placing this
  * object inside the sql package is the standard extension-library
  * technique for registering custom Catalyst expressions as Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Rebind `df` to a CLONE of its session carrying `confs`: any later
    * action on the returned frame plans and executes under those SQL
    * confs (`SQLExecution.withNewExecutionId` runs every action under
    * the owning session's conf via `withSQLConfPropagated`), while the
    * caller's session — and every other query — is untouched. This is
    * the per-DataFrame conf-scoping mechanism: operators that NEED a
    * non-default runtime conf (e.g. a raised ObjectHashAggregate
    * fallback threshold whose safety the operator itself guarantees)
    * apply it here instead of mutating the shared session.
    *
    * `cloneSession` copies session state (temp views, registered
    * functions, injected extensions, current conf) and shares the
    * SparkContext and SharedState (cache manager, catalog), so plans
    * referencing temp views or cached relations resolve identically. */
  def withSessionConfs(df: Dataset[Row], confs: Map[String, String]): Dataset[Row] = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val already = confs.forall { case (k, v) =>
      session.sessionState.conf.getConfString(k, null) == v
    }
    if (already) df
    else {
      val cloned = session.cloneSession()
      confs.foreach { case (k, v) => cloned.sessionState.conf.setConfString(k, v) }
      classic.Dataset.ofRows(cloned, df.queryExecution.analyzed)
    }
  }
}
