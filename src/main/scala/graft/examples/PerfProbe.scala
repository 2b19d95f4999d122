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
    // Canary (the Bench seismograph, min-of-2): one reading per timed
    // run, so probe numbers carry their own box-noise label — this box
    // bursts 2-10x for minutes at a time and an unlabeled median is
    // adjudication bait. Quiet reads ~0.05-0.18 s at local[32].
    import org.apache.spark.sql.functions.{sum => fsum, col => fcol}
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 32L << 20, 1L, 32).agg(fsum(fcol("id"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce() // pay the canary's own codegen before reading it
    def canary(): Double = math.min(canaryOnce(), canaryOnce())
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // two warmups: the first JIT-compiles the scan/codegen stack, the
      // second settles it — medians of cold-adjacent runs overstate
      // sub-second queries by 2-4x.
      fn(spark, sfDir).collect()
      fn(spark, sfDir).collect()
      val ts = (1 to runs).map { _ =>
        val c = canary()
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      val quiet = ts.filter(_._2 <= 0.2).map(_._1)
      val quietMin = if (quiet.nonEmpty) f"${quiet.min}%.3f" else "n/a"
      println(f"PROBE $n%-24s runs=${ts.map(t => f"${t._1}%.3f@${t._2}%.2f").mkString(",")} median=$med%.3f quiet_min=$quietMin")
    }
    spark.stop()
  }
}
