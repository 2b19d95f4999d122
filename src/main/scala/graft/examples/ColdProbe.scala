package graft.examples

import org.apache.spark.sql.SparkSession

/** Cold-start probe: times each named query's FIRST run in this JVM —
  * no warmup — so fit lineages, codegen compilation, and scan setup all
  * land on the measurement. This is the number a fresh driver sees, and
  * the one contention amplifies; run one query per JVM for a true cold
  * read of each. args: sfDir [names...]. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_ivf_search", "q_ivfpq", "q_ivf_flat")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_WARM_DIR: when set, run each query against it first
    // (JIT/codegen warm, like Bench's sf0.001 warmup pass) so the timed
    // number isolates the query's own per-dir cold cost (fits, scans) —
    // the figure BENCH_r{N} reports — from one-off JVM startup.
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      warmDir.foreach(w => try fn(spark, w).collect() catch { case _: Throwable => () })
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).collect().length
      println(f"COLD $n%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$cnt")
    }
    spark.stop()
  }
}
