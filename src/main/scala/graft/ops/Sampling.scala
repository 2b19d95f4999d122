package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-deterministic only for a FIXED partitioning —
  * repartition the input and membership changes, which poisons
  * reproducibility at scale (AQE, file splits, and cluster size all
  * change partitioning). These samplers decide membership from a
  * sha-derived hash of a row KEY instead: the same row is in or out
  * regardless of partitioning, executor count, or engine — and an
  * external SQL engine can reproduce the exact sample (the hash is
  * [[HashFunctions.hash60]], see q_sample_stratified's oracle).
  */
object Sampling {

  /** Parts-per-million membership threshold for a fraction. */
  private def ppm(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    math.round(fraction * 1000000.0)
  }

  /** Membership predicate: keep the row iff
    * hash60("sample:<salt>:" || key) mod 1e6 < fraction·1e6. */
  def keep(key: Column, fraction: Double, salt: String = ""): Column =
    HashFunctions.hash60(concat(lit(s"sample:$salt:"), key.cast("string"))) % 1000000L <
      lit(ppm(fraction))

  /** Uniform deterministic sample by key. */
  def byKey(df: DataFrame, keyCol: String, fraction: Double,
            salt: String = ""): DataFrame =
    df.where(keep(col(keyCol), fraction, salt))

  /** Stratified deterministic sample: a per-stratum fraction (e.g.
    * downsample dominant languages, keep all of rare ones). Strata not
    * in `rates` use `defaultFraction`. One narrow filter — no shuffle,
    * no count pass; rates are exact in expectation per stratum and
    * reproducible row-for-row. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double], defaultFraction: Double = 1.0,
                 salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(lit(ppm(defaultFraction))) {
      case (acc, (stratum, fraction)) =>
        when(col(strataCol) === stratum, lit(ppm(fraction))).otherwise(acc)
    }
    df.where(
      HashFunctions.hash60(concat(lit(s"sample:$salt:"), col(keyCol).cast("string"))) %
        1000000L < threshold)
  }
}
