package graft.examples

import org.apache.spark.sql.SparkSession

/** Temp perf probe: median-of-N timings for perf-watch queries.
  * args: sfDir [runs=N] [names...] (default 3 runs after 2 warmups —
  * sub-second queries need the extra warmup for stable JIT). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (runs, rest) = args.drop(1).toSeq match {
      case r +: tail if r.startsWith("runs=") => (r.stripPrefix("runs=").toInt, tail)
      case other => (3, other)
    }
    val names = if (rest.nonEmpty) rest
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
      // two warmups: the first JIT-compiles the scan/codegen stack, the
      // second settles it — medians of cold-adjacent runs overstate
      // sub-second queries by 2-4x.
      fn(spark, sfDir).collect()
      fn(spark, sfDir).collect()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"PROBE $n%-24s runs=${ts.map(t => f"$t%.3f").mkString(",")} median=$med%.3f")
    }
    spark.stop()
  }
}
