package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the manual salting counterpart to
  * AQE's runtime skew-join splitting (spark.sql.adaptive.skewJoin), for
  * the cases AQE can't fix: a single hot key whose rows exceed one
  * executor's memory even after splitting, or a deterministic plan
  * needed without AQE.
  *
  * Technique: the skewed (large) side gets a salt in [0, factor) derived
  * from a HASH OF THE ROW's other columns (deterministic — no rand(),
  * which would break retry/speculation correctness); the small side is
  * exploded `factor` times, one copy per salt value. The join key
  * becomes (key, salt), spreading each hot key over `factor` reducers.
  * Join RESULTS are identical to the unsalted join (asserted in
  * SkewToolsSpec); only the shuffle distribution changes.
  */
object SkewTools {

  /** Deterministic salt in [0, factor): xxhash64 of the given columns. */
  def saltCol(factor: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(factor)).cast("int")

  /** Inner equi-join of a skewed `large` side against a `small` side on
    * `key`, salted `factor` ways. `saltFrom` columns (default: all
    * non-key columns of `large`) feed the deterministic salt. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      factor: Int, saltFrom: Seq[String] = Nil): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltSrc =
      if (saltFrom.nonEmpty) saltFrom.map(col)
      else large.columns.filterNot(_ == key).map(col).toSeq match {
        // A keys-only large side has no other columns to hash (and
        // hashing the key alone would give every hot-key row the SAME
        // salt — no spreading). spark_partition_id() still spreads the
        // hot key by source partition, and is retry/speculation-safe:
        // a re-run task recomputes the same partition id.
        case Seq() => Seq(spark_partition_id())
        case cols  => cols
      }
    val saltedLarge = large.withColumn("__salt", saltCol(factor, saltSrc: _*))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)))).withColumn("__salt",
      col("__salt").cast("int"))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
