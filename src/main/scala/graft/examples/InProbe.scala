package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness (round-10, deleted after use): measures how a
  * raised `spark.sql.parquet.pushdown.inFilterThreshold` behaves at
  * large probe-set sizes against a sha-sorted key table — the shape
  * `DocumentStore.confirmDups` relies on. */
object InProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/intest_keys"
    if (!new java.io.File(dir).exists) {
      spark.range(4000000)
        .select(sha2(col("id").cast("string"), 256).as("k"), col("id"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(dir)
    }
    val hits = spark.read.parquet(dir).select("k")
      .sample(0.01, 42).limit(10000).collect().map(_.getString(0))
    val misses = (0 until 10000).map(i => s"miss_$i")
    val probes = (hits ++ misses).toSeq

    for (n <- Seq(768)) {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
        (n + 1).toString)
      val p = probes.take(n)
      val t0 = System.nanoTime()
      val c = spark.read.parquet(dir).where(col("k").isin(p: _*)).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"probe n=$n%6d  count=$c%6d  t=$t%6.2f s")
    }
    // What does the pushed filter look like at n=1000?
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "1001")
    val plan = spark.read.parquet(dir)
      .where(col("k").isin(probes.take(1000): _*))
      .queryExecution.executedPlan.toString
    println("PushedFilters form: " +
      plan.linesIterator.filter(_.contains("PushedFilters"))
        .map(_.take(200)).mkString(" | "))
    spark.stop()
  }
}
