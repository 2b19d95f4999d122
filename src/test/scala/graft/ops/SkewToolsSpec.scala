package graft.ops

import graft.SparkSpec

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result set == plain join result set on skewed data") {
    // 90% of rows share one hot key
    val large = (0 until 1000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, s"payload$i"))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "label").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = rows(large.join(small, Seq("k")))
    val salted = rows(SkewTools.saltedInnerJoin(large, small, "k", factor = 8))
    assert(plain.nonEmpty)
    assert(salted == plain)
  }

  test("keys-only large side still salts (partition-id fallback)") {
    // With no non-key columns, xxhash64() of zero args would fail
    // analysis; the fallback salts by source partition instead.
    val large = (0 until 200).map(i => if (i % 2 == 0) 42L else i.toLong)
      .toDF("k").repartition(8)
    val small = Seq((42L, "hot"), (3L, "b")).toDF("k", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "label").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows(SkewTools.saltedInnerJoin(large, small, "k", factor = 4)) ==
      rows(large.join(small, Seq("k"))))
  }

  test("salt is deterministic and within range") {
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val s1 = df.select(SkewTools.saltCol(8, $"v").as("s")).as[Int].collect()
    val s2 = df.select(SkewTools.saltCol(8, $"v").as("s")).as[Int].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.length > 1) // actually spreads
  }
}
