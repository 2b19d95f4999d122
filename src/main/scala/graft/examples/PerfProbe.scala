package graft.examples

import org.apache.spark.sql.SparkSession

/** Temp perf probe: 3-run timings for the round-3 perf-watch queries
  * (q_knn_self_top1, q_neardup_embedding). args: sfDir [names...] */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_knn_self_top1", "q_neardup_embedding")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warmup
      fn(spark, sfDir).collect()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n%-24s runs=${ts.map(t => f"$t%.3f").mkString(",")} median=${ts.sorted.apply(1)}%.3f")
    }
    spark.stop()
  }
}
