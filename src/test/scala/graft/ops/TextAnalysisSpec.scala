package graft.ops

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: a glued pair outranks common-word pairs; minCount suppresses rares") {
    // "new york" always co-occurs (5 times); "the" is everywhere, so
    // "of the" has high counts but low PMI; "rare pair" appears once.
    val docs = (
      Seq.fill(5)("travel to new york by the sea") ++
      Seq.fill(5)("the cost of the trip of the year") :+
      "rare pair"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.head._1 == "new york", s"top collocation was ${got.head}")
    assert(!got.map(_._1).contains("rare pair"))
    val pmis = got.map(_._3)
    assert(pmis.sorted.reverse.toSeq == pmis.toSeq) // ranked desc
  }

  private lazy val docs = Seq(
    (1L, "alpha alpha beta common"),
    (2L, "beta gamma common"),
    (3L, "common common common")).toDF("id", "text")

  test("analyze: null text nulls n_tokens (no fabricated -1 from size(null))") {
    val out = TextAnalysis.analyze(
      Seq((1L, Option.empty[String]), (2L, Option("real text here")))
        .toDF("id", "text"), "text")
    val r = out.where($"id" === 1L).head()
    assert(r.isNullAt(r.fieldIndex("n_tokens")),
      "null text must null n_tokens, not read as a -1-token document")
    assert(out.where($"id" === 2L).head()
      .getAs[Int]("n_tokens") == 3)
  }

  test("topKeywords ranks by tf*idf with deterministic ties") {
    val got = TextAnalysis.topKeywords(docs, "id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
    // N=3. idf: alpha df=1 -> ln(4/2)=ln2; beta df=2 -> ln(4/3);
    // gamma df=1 -> ln2; common df=3 -> ln(4/4)=0.
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2 = r6(math.log(2.0)); val ln43 = r6(math.log(4.0 / 3.0))
    // doc 1: alpha tf=2 -> 2ln2 top; beta ln(4/3) second.
    assert(got(1L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq(("alpha", r6(2 * math.log(2.0))), ("beta", ln43)))
    // doc 2: gamma ln2 top, beta second.
    assert(got(2L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ==
      Seq(("gamma", ln2), ("beta", ln43)))
    // doc 3: only 'common' (weight 0) -> still ranked, weight 0.
    assert(got(3L).map(t => (t._3, t._4)).toSeq == Seq(("common", 0.0)))
  }

  test("bigramSurprisal matches a hand-computed reference; short docs absent") {
    // Corpus: "a b a b" / "a c" / "x". Unigrams: a=3,b=2,c=1,x=1 -> V=4.
    // Bigrams: "a b"x2, "b a"x1, "a c"x1.
    val tiny = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("id", "text")
    def sp(c2: Long, c1: Long) = BigDecimal(-math.log((c2 + 1.0) / (c1 + 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg4(xs: Seq[BigDecimal]) =
      (xs.sum / xs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.bigramSurprisal(tiny, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: bigrams (a b), (b a), (a b) -> sp(2,3), sp(1,2), sp(2,3)
    assert(got(1L) == ((3L, avg4(Seq(sp(2, 3), sp(1, 2), sp(2, 3))))))
    assert(got(2L) == ((1L, avg4(Seq(sp(1, 3))))))
    assert(!got.contains(3L)) // single-token doc has no bigrams
  }

  test("topKeywords k truncates per doc and rank is dense from 1") {
    val one = TextAnalysis.topKeywords(docs, "id", "text", k = 1)
    assert(one.count() == 3)
    assert(one.select("rank").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("vocabCoverage ranks by frequency with exact cumulative coverage") {
    val tiny = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("id", "text")
    // counts: a=4, b=3, c=1, d=1 (ties by token); total 9
    val got = TextAnalysis.vocabCoverage(tiny, "text", topN = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 4L, 4.0 / 9), (2L, "b", 3L, 7.0 / 9), (3L, "c", 1L, 8.0 / 9)))
  }

  test("unigramSurprisal matches a hand-computed reference") {
    // Corpus: "a a b" / "b c". Vocab: a->2, b->2, c->1; T=5, V=3.
    val tiny = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    def sp(n: Long) = BigDecimal(-math.log((n + 1.0) / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def avg4(xs: Seq[BigDecimal]) =
      (xs.sum / xs.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.unigramSurprisal(tiny, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, avg4(Seq(sp(2), sp(2), sp(2))))))
    assert(got(2L) == ((2L, avg4(Seq(sp(2), sp(1))))))
    // rarer vocabulary -> higher surprisal
    assert(got(2L)._2 > got(1L)._2)
  }

  test("analyze() runs exactly ONE stats kernel pass in the optimized plan") {
    // Eight derived columns each embedding a copy of the let1(textStats)
    // tree relied on whole-stage-codegen subexpression elimination —
    // under interpreted regimes the kernel evaluated once PER COLUMN.
    // analyze() now materializes the struct as an aliased column;
    // CollapseProject must not inline the non-cheap alias back into its
    // consumers, over a real scan.
    val dir = java.nio.file.Files.createTempDirectory("ta_plan").toString
    Seq((1L, "the quick brown fox"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val out = TextAnalysis.analyze(spark.read.parquet(dir), "text")
    val plan = out.queryExecution.optimizedPlan.toString
    val kernels = plan.split("graft_text_stats").length - 1
    assert(kernels == 1, s"expected one graft_text_stats in:\n$plan")
    assert(!out.columns.exists(_.startsWith("__graft")))
    // a user column of the temp's name would be silently replaced then
    // dropped — rejected up front, like ngramCharSignals' __rep_sig
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.analyze(
        Seq((1L, "a", "x")).toDF("id", "text", "__graft_text_sig"), "text")
    }
    assert(e.getMessage.contains("__graft_text_sig"))
  }
}
