package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped statistical screens — the anomaly-detection siblings of the
  * quality filters: flag rows whose value deviates from their group.
  */
object Stats {

  /** Per-group z-score outliers: rows with |value − mean| ≥ threshold·σ
    * of their group (population σ). The determinism discipline: sum and
    * sum-of-squares run through EXACT DECIMAL aggregation (order-free,
    * so partitioning cannot change them), and only then drop to double
    * for the mean/variance divisions — identical expression shape on
    * any engine; the z-score is rounded before the threshold compare.
    *
    * Returns the input columns plus (mean, sigma, z) for flagged rows.
    *
    * Scale shape: one partial-aggregated groupBy for the moments (tiny
    * result: one row per group), broadcast back onto the scan — the
    * full pass is one narrow projection + filter. */
  def zscoreOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     threshold: Double = 3.0, roundScale: Int = 4): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val v = col(valueCol).cast("decimal(18,2)")
    val moments = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(v).cast("double").as("__s"),
        sum(v * v).cast("double").as("__ss"))
      .withColumn("mean", col("__s") / col("__n"))
      .withColumn("sigma",
        sqrt(col("__ss") / col("__n") - col("mean") * col("mean")))
      .drop("__n", "__s", "__ss")
    df.join(broadcast(moments), groupCols)
      .withColumn("z", round(
        (col(valueCol).cast("double") - col("mean")) / col("sigma"), roundScale))
      .where(abs(col("z")) >= threshold && col("sigma") > 0.0)
      .withColumn("mean", round(col("mean"), roundScale))
      .withColumn("sigma", round(col("sigma"), roundScale))
  }
}
