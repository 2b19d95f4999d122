package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks — the validation gate a training
  * pipeline runs before it trusts an input drop (in the spirit of
  * Deequ/Great Expectations, expressed as plain aggregates so the
  * results are engine-replayable). Each check returns a one-row
  * DataFrame (check STRING, violations BIGINT, pass BOOLEAN);
  * [[report]] unions them into one result. Checks are independent
  * Spark jobs over declarative plans — column pruning and predicate
  * pushdown reach the scans, and the counting aggregates partial-agg.
  */
object Checks {

  private def result(name: String, violations: Column): Column =
    struct(lit(name).as("check"), violations.cast("long").as("violations"),
      (violations === 0).as("pass"))

  /** Null count over `cols` (any null in any listed column counts the
    * row once per column): one conditional-sum pass. */
  def notNull(df: DataFrame, cols: Seq[String], name: String = ""): DataFrame = {
    require(cols.nonEmpty, "notNull: no columns to check")
    val label = if (name.nonEmpty) name else s"not_null(${cols.mkString(",")})"
    val nulls = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)))
      .reduce(_ + _)
    df.agg(result(label, coalesce(nulls, lit(0L))).as("r")).select("r.*")
  }

  /** Rows whose `column` falls outside [lo, hi] (nulls NOT counted —
    * pair with [[notNull]] when nulls are violations too). */
  def inRange(df: DataFrame, column: String, lo: Double, hi: Double,
              name: String = ""): DataFrame = {
    val label = if (name.nonEmpty) name else s"in_range($column,[$lo,$hi])"
    val bad = sum(when(col(column).isNotNull &&
      (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
    df.agg(result(label, coalesce(bad, lit(0L))).as("r")).select("r.*")
  }

  /** Duplicate-key mass: rows beyond the first per key value
    * (violations = total non-null-key rows − distinct key values).
    * Exact two-phase count-distinct — no row-level materialization.
    * Null-key rows are out of scope (pair with [[notNull]]) — but only
    * SQL-NULL: the filter is explicit isNotNull, NOT na.drop, because
    * na.drop also discards NaN key values and a pile of duplicate-NaN
    * keys would silently pass the uniqueness gate (groupBy/countDistinct
    * treat NaN = NaN, so they're countable duplicates). */
  def uniqueKey(df: DataFrame, keys: Seq[String], name: String = ""): DataFrame = {
    require(keys.nonEmpty, "uniqueKey: no key columns to check")
    val label = if (name.nonEmpty) name else s"unique_key(${keys.mkString(",")})"
    val keyed = df.where(keys.map(c => col(c).isNotNull).reduce(_ && _))
      .select(keys.map(col): _*)
    keyed.agg(result(label,
        count(lit(1)) - countDistinct(keys.map(col).head, keys.map(col).tail: _*))
      .as("r")).select("r.*")
  }

  /** Referential integrity: non-null `fk` values in `child` with no
    * matching `pk` in `parent` — one left_anti equi-join (broadcast
    * when the parent key set is small, hash otherwise). */
  def foreignKey(child: DataFrame, fk: String, parent: DataFrame, pk: String,
                 name: String = ""): DataFrame = {
    val label = if (name.nonEmpty) name else s"foreign_key($fk->$pk)"
    val orphans = child.where(col(fk).isNotNull).select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
    orphans.agg(result(label, count(lit(1))).as("r")).select("r.*")
  }

  /** Union of check results into one report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "no checks to report")
    checks.reduce(_ unionByName _)
  }
}
