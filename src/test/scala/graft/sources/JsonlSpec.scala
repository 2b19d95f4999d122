package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-jsonl").toString + "/out"

  test("write -> read round-trips rows including map and array columns") {
    val df = Seq(
      (0L, "alpha doc", Map("k" -> "v", "n" -> "1"), Seq(0.5, -1.25)),
      (1L, "beta \"quoted\" doc", Map.empty[String, String], Seq.empty[Double]),
      (2L, "gamma", Map("x" -> "y"), Seq(3.0))
    ).toDF("id", "text", "meta", "vec")
    val dir = tmp()
    Jsonl.write(df, dir, shards = 2)
    val back = Jsonl.read(spark, dir, df.schema)
    // JSON sources are always-nullable; names and types must match.
    assert(back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    val key = (r: org.apache.spark.sql.Row) => r.getAs[Long]("id")
    val got = back.collect().sortBy(key).map(_.toString).toSeq
    val want = df.collect().sortBy(key).map(_.toString).toSeq
    assert(got == want)
  }

  test("write keeps null fields on every line and accepts dotted column names") {
    // to_json drops null fields by default, which breaks the
    // "every column on every line" interchange contract; and a dotted
    // column name must not be parsed as a nested-field reference.
    val df = Seq((0L, Option("en")), (1L, Option.empty[String]))
      .toDF("id", "meta.lang")
    val dir = tmp()
    Jsonl.write(df, dir, shards = 1)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(lines.length == 2)
    assert(lines.forall(_.contains("\"meta.lang\"")), lines.mkString("\n"))
    assert(lines.exists(_.contains("\"meta.lang\":null")), lines.mkString("\n"))
  }

  test("shards controls file count; lines are one JSON object each") {
    val df = (0 until 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val dir = tmp()
    Jsonl.write(df, dir, shards = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
    assert(files.length == 4)
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.endsWith("}"))
    assert(Jsonl.readInferred(spark, dir).count() == 100)
  }
}
