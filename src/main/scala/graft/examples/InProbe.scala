package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind [[graft.store.DocumentStore.SafeInProbe]]:
  * how does a raised `spark.sql.parquet.pushdown.inFilterThreshold`
  * behave as the probe-set size grows against a sha-sorted key table
  * (the `DocumentStore.confirmDups` shape)?
  *
  * Finding (this Spark, JDK 17, default task stacks): the pushed In
  * compiles to an or-chain whose evaluation overflows the task stack —
  * 768 string equalities SOE a COLD JVM on every run, 512 pass; after
  * JIT warms the visitor, 1000+ pass. Run each size IN ITS OWN JVM
  * (`runMain graft.examples.InProbe <n>`) or the warm JVM hides the
  * cliff — that is exactly how the hazard survived round-10's witness
  * runs until probed cold.
  */
object InProbe {
  def main(a: Array[String]): Unit = {
    val n = a.headOption.map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/intest_keys"
    // _BUILT-marker protocol (same as ScaleBench/SkewBench.build): the
    // doc tells users to run each size in its own JVM, so interrupted
    // first builds are routine — a bare dir-exists check would then
    // skip the rebuild forever and probe a truncated table.
    val done = new java.io.File(s"$dir/_BUILT")
    if (!done.exists) {
      spark.range(4000000)
        .select(sha2(col("id").cast("string"), 256).as("k"), col("id"))
        .repartitionByRange(8, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(dir)
      done.createNewFile()
      ()
    }
    val hits = spark.read.parquet(dir).select("k")
      .sample(0.01, 42).limit(n).collect().map(_.getString(0)).toSeq
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold",
      (n + 1).toString)
    val t0 = System.nanoTime()
    val c = spark.read.parquet(dir).where(col("k").isin(hits: _*)).count()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"probe n=$n%6d  count=$c%6d  t=$t%6.2f s  (no SOE)")
    spark.stop()
  }
}
