package graft

import org.apache.spark.sql.functions._

/** The resolver-aware guard lens: Spark's withColumn/drop match names
  * with the SESSION resolver (case-insensitive by default), so every
  * API-boundary collision guard must match the same way — an input
  * column differing only in case from a written name would otherwise
  * slip past the guard and be silently replaced. */
class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("Cols.has follows the session resolver (default case-insensitive)") {
    val df = Seq((1, "a")).toDF("Id", "Text")
    assert(Cols.has(df, "id"))
    assert(Cols.has(df, "ID"))
    assert(!Cols.has(df, "idx"))
    assert(Cols.overlap(df, Seq("text", "missing")) == Seq("text"))
  }

  test("Cols.has honours spark.sql.caseSensitive=true") {
    val df = Seq((1, "a")).toDF("Id", "Text")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      assert(!Cols.has(df, "id"))
      assert(Cols.has(df, "Id"))
    } finally spark.conf.unset("spark.sql.caseSensitive")
  }

  test("withColumn really does replace a case-different column (the hazard)") {
    // Pin the Spark behavior the guards exist for: if this ever stops
    // replacing, the guards can relax to exact-case.
    val df = Seq((1, "keep")).toDF("id", "Shard")
    val out = df.withColumn("shard", lit(9))
    assert(out.columns.count(_.equalsIgnoreCase("shard")) == 1)
    assert(out.select("shard").head.getInt(0) == 9)
  }

  test("seededShuffle refuses a case-different shard column") {
    val df = Seq((1, "x")).toDF("id", "Shard")
    val e = intercept[IllegalArgumentException] {
      ops.Sampling.seededShuffle(df, "id", 4)
    }
    assert(e.getMessage.contains("shard"))
  }

  test("capPerKey refuses a case-different rank column") {
    val df = Seq((1, 2, "x")).toDF("k", "RANK", "v")
    val e = intercept[IllegalArgumentException] {
      ops.Sampling.capPerKey(df, Seq("k"), 1, Seq(col("v")))
    }
    assert(e.getMessage.contains("rank"))
  }

  test("splitByGroup / epochMix / tokenBudget refuse case-different outputs") {
    val s = Seq((1, "a")).toDF("id", "SPLIT")
    intercept[IllegalArgumentException] {
      ops.Sampling.splitByGroup(s, "id", Seq("train" -> 1.0))
    }
    val m = Seq((1, "a")).toDF("id", "Copy_Id")
    intercept[IllegalArgumentException] {
      ops.Sampling.epochMix(m, "id", "id", Map.empty[String, Double])
    }
    val t = Seq((1, 5L, "a")).toDF("id", "n", "__GRAFT_TOKEN_BUDGET_CUM")
    intercept[IllegalArgumentException] {
      ops.Sampling.tokenBudget(t, "id", "id", "n", 10L)
    }
  }

  test("asof join flags a case-different payload clash") {
    val l = Seq((1, 10L, "x")).toDF("k", "t", "Price")
    val r = Seq((1, 9L, "y")).toDF("k", "t2", "price")
    val e = intercept[IllegalArgumentException] {
      ops.AsofJoin.asofBackward(l, r, Seq("k"), "t", "t2", "t", "t2")
    }
    assert(e.getMessage.toLowerCase.contains("price"))
  }

  test("intervalJoinStream treats case-different names as collisions") {
    // Guard fires during plan construction, before any streaming
    // execution — batch frames exercise it.
    val l = Seq((1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "a"))
      .toDF("k", "TS", "v")
    val r = Seq((1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "b"))
      .toDF("k", "ts", "ts_right")
    // right already has ts_right -> the rename target is taken: refuse.
    val e = intercept[IllegalArgumentException] {
      streaming.StreamingOps.intervalJoinStream(l, r, "k", "TS", "ts")
    }
    assert(e.getMessage.contains("ts_right"))
  }

  test("searchRotated refuses a case-different __rvec column") {
    val docs = Seq(
      (1L, Seq(1.0, 0.0), "u"), (2L, Seq(0.0, 1.0), "u"),
      (3L, Seq(1.0, 1.0), "u"), (4L, Seq(0.5, 0.2), "u"))
      .toDF("vec_id", "vec", "__RVEC")
    val model = index.PqIndex.fit(
      docs.select("vec_id", "vec"), "vec", m = 2, ksub = 2)
    val rot = index.PqIndex.HouseholderRotation(IndexedSeq(1.0, 1.0))
    intercept[IllegalArgumentException] {
      index.PqIndex.searchRotated(docs, "vec", rot, model,
        Seq(1.0, 0.0), k = 1, candidates = 4)
    }
  }

  test("dedupStream refuses a case-different internal key column") {
    val df = Seq(("a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "x"))
      .toDF("text", "ts", "__GRAFT_DEDUP_KEY")
    intercept[IllegalArgumentException] {
      streaming.StreamingOps.dedupStream(df, "text", "ts")
    }
  }
}
