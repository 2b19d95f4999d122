package graft.examples

import org.apache.spark.sql.SparkSession

/** Temp perf probe: time named SparkEntry queries (same `.count()`
  * action as graft.Bench) for N rounds under an arbitrary conf, so a
  * config posture can be A/B-measured in isolation.
  * args: sfDir rounds q1 [q2 ...]
  * env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CONF "k=v;k=v"
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to rounds).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"TIMER $name round=$r ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }
}
