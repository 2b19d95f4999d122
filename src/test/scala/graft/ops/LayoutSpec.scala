package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (hand-checked patterns)") {
    // x=3 (011), y=5 (101): x bit i -> pos 2i, y bit i -> pos 2i+1
    // pos0 x0=1, pos1 y0=1, pos2 x1=1, pos3 y1=0, pos4 x2=0, pos5 y2=1
    // = 1 + 2 + 4 + 32 = 39
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y"))).as("z"))
      .as[Long].head()
    assert(got == 39L)
    // single column degenerates to identity over `bits` bits
    val id = Seq(1234567L).toDF("x")
      .select(Layout.zvalue(Seq(col("x"))).as("z")).as[Long].head()
    assert(id == 1234567L)
    // three columns: x=1,y=1,z=1 -> bits 0,1,2 -> 7
    val three = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.zvalue(Seq(col("a"), col("b"), col("c"))).as("z"))
      .as[Long].head()
    assert(three == 7L)
  }

  test("zvalue enforces its input contract: negative/overwide keys raise with the value; clamp opts in") {
    val df = Seq((-7L, 5L)).toDF("x", "y")
    val neg = intercept[Exception] {
      df.select(Layout.zvalue(Seq(col("x"), col("y"))).as("z")).collect()
    }
    // raise_error surfaces wrapped in a SparkException chain — the
    // offending tuple must be visible somewhere in it.
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages(neg).contains("-7"))
    // a key wider than `bits` raises too (silently dropping high bits
    // would collapse distant keys onto the same curve cell)
    val wide = intercept[Exception] {
      Seq(Tuple1(1L << 22)).toDF("x")
        .select(Layout.zvalue(Seq(col("x")), bits = 21).as("z")).collect()
    }
    assert(messages(wide).contains((1L << 22).toString))
    // clamp = true pins to the curve edge instead of raising
    val clamped = df
      .select(Layout.zvalue(Seq(col("x"), col("y")), clamp = true).as("z"))
      .as[Long].head()
    val atEdge = Seq((0L, 5L)).toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y"))).as("z")).as[Long].head()
    assert(clamped == atEdge)
    // null inputs keep propagating to a null z-value (not an error)
    val nullZ = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y"))).as("z"))
      .collect().head
    assert(nullZ.isNullAt(0))
    // ... under clamp too: least/greatest SKIP nulls, so the naive
    // clamp pinned a NULL key to the curve's top edge among genuine
    // max-key rows instead of yielding NULL.
    val nullClamped = Seq((Some(3L), Option.empty[Long])).toDF("x", "y")
      .select(Layout.zvalue(Seq(col("x"), col("y")), clamp = true).as("z"))
      .collect().head
    assert(nullClamped.isNullAt(0))
  }

  test("zvalue monotone on the curve: nearby cells share prefixes, quadrants order") {
    // the four 2x2 quadrants of a 4x4 grid occupy disjoint, ordered
    // z-ranges: (x<2,y<2) < (x>=2,y<2) < (x<2,y>=2) < (x>=2,y>=2)
    val z = (for { x <- 0 until 4; y <- 0 until 4 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zvalue(Seq(col("x"), col("y"))).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def quadrant(p: ((Long, Long), Long)) = (p._1._1 / 2, p._1._2 / 2)
    val ranges = z.groupBy(quadrant).map { case (q, m) =>
      q -> (m.values.min, m.values.max)
    }
    assert(ranges((0L, 0L))._2 < ranges((1L, 0L))._1)
    assert(ranges((1L, 0L))._2 < ranges((0L, 1L))._1)
    assert(ranges((0L, 1L))._2 < ranges((1L, 1L))._1)
  }

  test("z-ordered files cover small bounding boxes on BOTH dims; x-sort does not") {
    val n = 64
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val xdir = java.nio.file.Files.createTempDirectory("graft_xsort").toString
    Layout.zorderWrite(grid, Seq("x", "y"), zdir, numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)

    def fileAreas(dir: String): Seq[Long] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .select("area").as[Long].collect().toSeq

    val zAreas = fileAreas(zdir)
    val xAreas = fileAreas(xdir)
    assert(zAreas.size == 16 && xAreas.size == 16)
    // x-sorted files each span the FULL y range: area ~ (64/16)*64 = 256
    // z-ordered files cover compact hypercubes: 16 files of 16x16 = 256...
    // both total 4096 cells, but a (x in [0,15], y in [0,15]) box query
    // intersects 1 z-file vs 4 x-files. Assert the intersection counts.
    def hits(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .where(col("x0") <= 15 && col("x1") >= 0 &&
          col("y0") <= 15 && col("y1") >= 0)
        .count()
    assert(hits(zdir) < hits(xdir),
      s"z-order should touch fewer files: z=${hits(zdir)} x=${hits(xdir)}")
    // round trip preserves the data
    assert(spark.read.parquet(zdir).count() == n.toLong * n)
  }
}
