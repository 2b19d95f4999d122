package graft.examples

import org.apache.spark.sql.SparkSession

/** Temp probe: run a SQL file against the testdata views (parity
  * debugging for SharedSql candidates). args: sfDir sqlFile. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, file) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), "UTF-8")
    val df = spark.sql(sql)
    val rows = df.collect()
    println(s"ROWS=${rows.length}")
    df.show(5, 60)
    spark.stop()
  }
}
