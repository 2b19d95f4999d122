package graft.ops

import org.apache.spark.sql.functions.countDistinct

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val n = 2000
  private lazy val rows = (0 until n)
    .map(i => (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
    .toDF("id", "lang")

  test("tokenBudget: per-domain totals stay under budget; deterministic; budget-monotone") {
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 10L + i % 7)).toDF("id", "dom", "toks")
    val kept = Sampling.tokenBudget(docs, "id", "dom", "toks", budget = 300, seed = "s")
    val totals = kept.groupBy("dom").sum("toks").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals.values.forall(_ <= 300), s"over budget: $totals")
    // fills close to the budget (within one max-sized doc)
    assert(totals.values.forall(_ > 300 - 17), s"under-filled: $totals")
    // membership is a pure function of (seed, corpus)
    val again = Sampling.tokenBudget(docs.repartition(7), "id", "dom", "toks",
      budget = 300, seed = "s").select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
    // a bigger budget strictly extends the same fill order
    val bigger = Sampling.tokenBudget(docs, "id", "dom", "toks", budget = 600,
      seed = "s").select("id").as[Long].collect().toSet
    assert(kept.select("id").as[Long].collect().toSet.subsetOf(bigger))
    // a different seed picks a different prefix
    val otherSeed = Sampling.tokenBudget(docs, "id", "dom", "toks", budget = 300,
      seed = "t").select("id").as[Long].collect().toSet
    assert(otherSeed != again)
  }

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

  test("seededShuffle: a permutation, partition-independent, seed-sensitive") {
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.seededShuffle(df, "id", nShards = 4, seed = seed)
        .select("id", "shard", "shard_pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = run(rows, "s1")
    // every row exactly once, shard positions are 1..count(shard) dense
    assert(a.map(_._1).distinct.size == n)
    a.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted == (1L to g.size).toSeq)
    }
    assert(a == run(rows.repartition(17), "s1")) // partitioning-independent
    assert(a != run(rows, "s2"))                 // seed changes the order
  }

  test("capPerKey ships hash mode: zero sort-fallback tasks, caller conf untouched, same rows") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.get(FallbackKey)
    // 500 distinct keys in ONE input partition: far past the stock 128
    // threshold, so the unscoped plan's partial aggregate must fall
    // back to sort mode while the shipped operator stays hashed.
    val df = spark.range(0, 20000, 1, 1).toDF("id")
      .withColumn("key", $"id" % 500)
      .withColumn("value", ($"id" * 37 % 1000).cast("double"))
    // The PARTIAL aggregate (where 500 keys/task live) sits inside a
    // materialized ShuffleQueryStageExec LEAF under AQE — descend into
    // stages, not just the final plan.
    def aggNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[ObjectHashAggregateExec] =
      p.collect {
        case o: ObjectHashAggregateExec => Seq(o)
        case a: AdaptiveSparkPlanExec => aggNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => aggNodes(q.plan)
      }.flatten
    def fallbackTasks(out: org.apache.spark.sql.DataFrame): Long = {
      out.collect()
      val aggs = aggNodes(out.queryExecution.executedPlan)
      assert(aggs.nonEmpty, "expected ObjectHashAggregateExec nodes in the plan")
      aggs.map(_.metrics("numTasksFallBacked").value).sum
    }
    val shipped = Sampling.capPerKey(df, Seq("key"), 2, Seq(-$"value", $"id"))
    val raw = Sampling.capPerKeyPlan(df, Seq("key"), 2, Seq(-$"value", $"id"))
    assert(fallbackTasks(shipped) == 0L, "shipped capPerKey must run in hash mode")
    assert(fallbackTasks(raw) > 0L, "raw plan at stock conf should witness the fallback")
    assert(shipped.collect().map(_.toString).sorted.toSeq ==
      raw.collect().map(_.toString).sorted.toSeq)
    // The conf is scoped to the operator's plan: the caller's session
    // (and its later queries) never sees the raised threshold.
    assert(spark.conf.get(FallbackKey) == before)
    // GraftSqlBridge.rebind is the documented escape hatch: detaching
    // the frame puts later actions back under the LIVE session conf
    // (the embedded bounded agg then runs at the stock threshold —
    // slower, identical rows).
    val detached = org.apache.spark.sql.GraftSqlBridge.rebind(shipped, spark)
    assert(detached.sparkSession eq spark)
    assert(detached.collect().map(_.toString).sorted.toSeq ==
      raw.collect().map(_.toString).sorted.toSeq)
  }

  test("seededShuffle: a user column named shuffle_key survives; internal __shuffle_key is guarded") {
    val withUserCol = rows.withColumn("shuffle_key", $"id" * 2)
    val out = Sampling.seededShuffle(withUserCol, "id", nShards = 4)
    // The internal sort key is __-prefixed, so the user's column is
    // neither overwritten nor dropped.
    assert(out.columns.contains("shuffle_key"))
    assert(out.where($"shuffle_key" =!= $"id" * 2).isEmpty)
    val clash = intercept[IllegalArgumentException] {
      Sampling.seededShuffle(rows.withColumn("__shuffle_key", $"id"), "id", 4)
    }
    assert(clash.getMessage.contains("__shuffle_key"))
  }

  test("seededShuffle shards are roughly balanced") {
    val counts = Sampling.seededShuffle(rows, "id", nShards = 4)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length == 4)
    assert(counts.forall(c => c > n / 4 * 0.8 && c < n / 4 * 1.2))
  }

  test("epochMix: integer weights repeat exactly, weight 0 drops") {
    val mixed = Sampling.epochMix(rows, "id", "lang",
      weights = Map("en" -> 2.0, "de" -> 0.0), defaultWeight = 1.0)
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 2L * (n / 4)) // copy_id 0 and 1 each
    assert(!byLang.contains("de"))
    assert(byLang("fr") == n / 2)
    val copyIds = mixed.where($"lang" === "en").groupBy("copy_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(copyIds == Map(0 -> n / 4, 1 -> n / 4))
  }

  test("epochMix: fractional weights sample the extra epoch deterministically") {
    val mixed = Sampling.epochMix(rows, "id", "lang",
      weights = Map("en" -> 1.5), defaultWeight = 1.0)
    val en = mixed.where($"lang" === "en").count().toDouble / (n / 4)
    assert(en > 1.35 && en < 1.65) // ~1.5 epochs
    val again = Sampling.epochMix(rows.repartition(13), "id", "lang",
      weights = Map("en" -> 1.5), defaultWeight = 1.0)
      .select("id", "copy_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val first = mixed.select("id", "copy_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(first == again) // row-for-row reproducible
  }

  test("negativePairs: k per anchor, never self, deterministic, partition-independent") {
    val pairs = Sampling.negativePairs(rows, "id", k = 3, seed = "t",
      partnerCols = Seq("lang"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getString(3))).toSeq
    assert(got.length == n * 3)
    assert(got.forall { case (a, _, neg, _) => a != neg })
    assert(got.forall { case (_, _, neg, _) => neg >= 0 && neg < n })
    // partner columns match a direct lookup
    val langOf = rows.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (_, _, neg, l) => langOf(neg) == l })
    // deterministic + partition-independent
    val again = Sampling.negativePairs(rows.repartition(17), "id", k = 3,
      seed = "t", partnerCols = Seq("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3))).toSeq
    assert(got.toSet == again.toSet)
    // seed-sensitive
    val other = Sampling.negativePairs(rows, "id", k = 3, seed = "u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(other != got.map(t => (t._1, t._2, t._3)).toSet)
    // draws spread across the corpus (not degenerate)
    assert(got.map(_._3).distinct.length > n / 2)
  }

  test("capPerKey matches the rank-window form: ties, hot key, cap > group, partition-independent") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // One hot key (70% of rows), heavy score ties, one tiny group that
    // the cap exceeds.
    val rows = (1 to 200).map { i =>
      val key = if (i % 10 < 7) "hot" else if (i % 10 < 9) "warm" else "cold"
      (i.toLong, key, (i % 5).toLong)
    }.toDF("id", "domain", "score")
    val expected = rows.withColumn("rank",
        row_number().over(Window.partitionBy("domain")
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .where(col("rank") <= 7)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val got = Sampling.capPerKey(rows, Seq("domain"), cap = 7,
        priority = Seq(-col("score"), col("id")))
      .select("id", "domain", "score", "rank")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(got === expected)
    val repart = Sampling.capPerKey(rows.repartition(13), Seq("domain"), cap = 7,
        priority = Seq(-col("score"), col("id")))
      .select("id", "domain", "score", "rank")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(repart === expected)
  }

  test("splitByGroup keeps every group in exactly one split, fractions sum-checked") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, s"g${i % 40}")).toDF("id", "grp")
    val out = Sampling.splitByGroup(df, "grp",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)), salt = "s")
    // group-atomic: one distinct split per group
    val perGroup = out.groupBy("grp")
      .agg(countDistinct("split").as("n")).as[(String, Long)].collect()
    assert(perGroup.forall(_._2 == 1L), perGroup.toSeq)
    // all three splits appear over 40 groups and are deterministic
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits === Set("train", "valid", "test"))
    val again = Sampling.splitByGroup(df, "grp",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)), salt = "s")
      .orderBy("id").select("split").as[String].collect().toSeq
    assert(again === out.orderBy("id").select("split").as[String].collect().toSeq)
    // a different salt reshuffles group assignment
    val other = Sampling.splitByGroup(df, "grp",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)), salt = "other")
      .orderBy("id").select("split").as[String].collect().toSeq
    assert(other !== again)
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(df, "grp", Seq(("a", 0.5), ("b", 0.4)))
    }
  }
}
