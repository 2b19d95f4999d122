package graft.ops

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val n = 2000
  private lazy val rows = (0 until n)
    .map(i => (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
    .toDF("id", "lang")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("membership is independent of partitioning") {
    val a = ids(Sampling.byKey(rows, "id", 0.3))
    val b = ids(Sampling.byKey(rows.repartition(13), "id", 0.3))
    val c = ids(Sampling.byKey(rows.coalesce(1), "id", 0.3))
    assert(a == b && b == c)
    assert(a.nonEmpty && a.size < n)
  }

  test("samples are nested: fraction 0.1 is a subset of fraction 0.3") {
    val small = ids(Sampling.byKey(rows, "id", 0.1))
    val big = ids(Sampling.byKey(rows, "id", 0.3))
    assert(small.subsetOf(big))
  }

  test("fractions are approximately honored and salts decorrelate") {
    val f = ids(Sampling.byKey(rows, "id", 0.5)).size.toDouble / n
    assert(f > 0.45 && f < 0.55)
    val s1 = ids(Sampling.byKey(rows, "id", 0.5, salt = "a"))
    val s2 = ids(Sampling.byKey(rows, "id", 0.5, salt = "b"))
    assert(s1 != s2)
  }

  test("stratified applies per-stratum rates with the default elsewhere") {
    val sampled = Sampling.stratified(rows, "id", "lang",
      rates = Map("en" -> 0.0, "de" -> 1.0), defaultFraction = 0.5)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("en"))
    assert(byLang("de") == n / 4)       // rate 1.0 keeps every de row
    val frRate = byLang("fr").toDouble / (n / 2)
    assert(frRate > 0.4 && frRate < 0.6)
  }

  test("edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.byKey(rows, "id", 0.0).isEmpty)
    assert(Sampling.byKey(rows, "id", 1.0).count() == n)
  }
}
