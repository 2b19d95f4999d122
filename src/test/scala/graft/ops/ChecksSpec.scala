package graft.ops

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), 5.0),
    (Some(2L), None, 50.0),
    (Some(2L), Some("c"), -1.0),
    (None, Some("d"), 7.0)
  ).toDF("id", "name", "v")

  private def row(r: org.apache.spark.sql.DataFrame) = {
    val x = r.collect().head
    (x.getAs[String]("check"), x.getAs[Long]("violations"), x.getAs[Boolean]("pass"))
  }

  test("notNull counts nulls per listed column") {
    assert(row(Checks.notNull(df, Seq("id"))) == (("not_null(id)", 1L, false)))
    assert(row(Checks.notNull(df, Seq("id", "name"))) ==
      (("not_null(id,name)", 2L, false)))
    assert(row(Checks.notNull(df, Seq("v"))) == (("not_null(v)", 0L, true)))
  }

  test("inRange ignores nulls, counts out-of-range rows") {
    assert(row(Checks.inRange(df, "v", 0.0, 10.0)) ==
      (("in_range(v,[0.0,10.0])", 2L, false))) // 50.0 and -1.0
    assert(row(Checks.inRange(df, "v", -10.0, 100.0))._3)
  }

  test("uniqueKey counts duplicate mass over non-null keys") {
    // ids 1, 2, 2 (null dropped): 3 rows, 2 distinct -> 1 violation
    assert(row(Checks.uniqueKey(df, Seq("id"))) == (("unique_key(id)", 1L, false)))
    assert(row(Checks.uniqueKey(df, Seq("id", "name")))._3) // composite unique
  }

  test("empty input: every check passes with zero violations") {
    val empty = Seq.empty[(Option[Long], Option[String], Double)]
      .toDF("id", "name", "v")
    assert(row(Checks.notNull(empty, Seq("id"))) == (("not_null(id)", 0L, true)))
    assert(row(Checks.inRange(empty, "v", 0.0, 1.0))._3)
    assert(row(Checks.uniqueKey(empty, Seq("id")))._3)
    assert(row(Checks.foreignKey(empty, "id", Seq(1L).toDF("pid"), "pid"))._3)
  }

  test("empty column lists fail fast with a named require, not reduce/head noise") {
    val msg1 = intercept[IllegalArgumentException] {
      Checks.notNull(df, Seq.empty)
    }.getMessage
    assert(msg1.contains("notNull"))
    val msg2 = intercept[IllegalArgumentException] {
      Checks.uniqueKey(df, Seq.empty)
    }.getMessage
    assert(msg2.contains("uniqueKey"))
  }

  test("foreignKey counts orphans; report unions everything") {
    val parent = Seq(1L, 3L).toDF("pid")
    val fkRes = row(Checks.foreignKey(df, "id", parent, "pid"))
    assert(fkRes == (("foreign_key(id->pid)", 2L, false))) // the two id=2 rows
    val rep = Checks.report(Seq(
      Checks.notNull(df, Seq("v")),
      Checks.uniqueKey(df, Seq("id")),
      Checks.foreignKey(df, "id", parent, "pid")))
    assert(rep.count() == 3)
    assert(rep.where($"pass").count() == 1)
  }

  test("uniqueKey: duplicate NaN keys are violations (NaN is not null)") {
    // na.drop would discard NaN keys along with nulls and the duplicate
    // mass would silently pass; groupBy semantics treat NaN = NaN, so
    // five NaN rows are four violations. Nulls stay out of scope.
    val nan = Double.NaN
    val df = Seq(Option(nan), Option(nan), Option(nan), Option(nan),
      Option(nan), Option(1.0), Option.empty[Double], Option.empty[Double])
      .toDF("k")
    val r = row(Checks.uniqueKey(df, Seq("k")))
    assert(r == (("unique_key(k)", 4L, false)))
  }
}
