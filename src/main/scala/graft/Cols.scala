package graft

import org.apache.spark.sql.DataFrame

/** Resolver-aware column-name checks for API-boundary guards.
  *
  * `withColumn` / `withColumnRenamed` / `drop` decide replace-vs-add
  * with the SESSION's name resolver — case-insensitive unless
  * `spark.sql.caseSensitive=true` — so a guard written as exact-case
  * `columns.contains(name)` misses a column differing only in case,
  * and the hazard the guard exists to prevent (silent replacement of
  * user data, unwritable duplicate output names) lands anyway: an
  * input with `Shard` sails past `!columns.contains("shard")` and
  * `withColumn("shard", …)` then REPLACES it. One definition of "does
  * this frame already have a column named X, as Spark itself would
  * resolve X against it", reading the owning session's live conf.
  */
private[graft] object Cols {

  private def sensitive(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean

  /** Name equality under `df`'s session resolver — the same rule
    * Spark's analyzer applies when `withColumn`/`drop`/`col(name)`
    * match `name` against the frame's schema. */
  def same(df: DataFrame)(a: String, b: String): Boolean =
    if (sensitive(df)) a == b else a.equalsIgnoreCase(b)

  /** Does `df` already have a column that `name` would resolve to? */
  def has(df: DataFrame, name: String): Boolean = {
    val eq = same(df) _
    df.columns.exists(eq(_, name))
  }

  /** The subset of `names` that would resolve to an existing column of
    * `df` (returned in `names`'s spelling, for error messages). */
  def overlap(df: DataFrame, names: Seq[String]): Seq[String] = {
    val eq = same(df) _
    names.filter(n => df.columns.exists(eq(_, n)))
  }
}
