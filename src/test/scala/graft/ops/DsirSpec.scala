package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR hashed-bigram importance weights: target-like documents score
  * higher; determinism and edge rules. */
class DsirSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta alpha beta alpha beta"),  // target-like
      (1L, "alpha beta alpha beta"),             // target-like
      (2L, "gamma delta gamma delta gamma"),     // off-target
      (3L, "epsilon zeta epsilon zeta"),         // off-target
      (4L, "alpha beta gamma delta"),            // mixed
      (5L, "solo")                               // < 2 tokens: no row
    ).toDF("doc_id", "text")
  }

  private def weights = Dsir.importanceWeights(
    corpus, corpus.where(col("doc_id").isin(0L, 1L)), "doc_id", "text",
    buckets = 256)

  test("target-like documents outweigh off-target ones; <2-token docs drop") {
    val w = weights.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!w.contains(5L))
    assert(w(0L) > w(2L) && w(0L) > w(3L))
    assert(w(1L) > w(2L))
    // Mixed doc sits between pure-target and pure-off-target (per
    // bigram: its average bigram evidence is weaker than doc 1's).
    assert(w(4L) < w(1L) && w(4L) > w(3L))
  }

  test("n_bigrams counts occurrences, not distinct bigrams") {
    val n = weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(0L) === 5L) // 6 tokens -> 5 bigram occurrences
    assert(n(4L) === 3L)
  }

  test("selectTopK: round-before-rank with id tie-break, exact k selected") {
    val sel = Dsir.selectTopK(weights, "doc_id", k = 2)
      .orderBy("doc_id").collect()
    assert(sel.map(_.getInt(3)).sum === 2)
    // Docs 0 and 1 are the most target-like.
    val chosen = sel.filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert(chosen === Set(0L, 1L))
  }

  test("selectTopK: boundary ties split by ascending id, exactly k selected") {
    import spark.implicits._
    val w = Seq(
      (1L, 3L, 2.5), (2L, 3L, 1.0), (3L, 3L, 1.0), (4L, 3L, 1.0),
      (5L, 3L, 0.5)).toDF("doc_id", "n_bigrams", "logweight")
    val sel = Dsir.selectTopK(w, "doc_id", k = 3).orderBy("doc_id")
      .collect().map(_.getInt(3)).toSeq
    assert(sel === Seq(1, 1, 1, 0, 0))
  }

  test("selectTopK: fewer rows than k selects every row") {
    val sel = Dsir.selectTopK(weights, "doc_id", k = 100).collect()
    assert(sel.nonEmpty && sel.forall(_.getInt(3) == 1))
  }

  test("selectTopK plans as a TakeOrdered boundary — no global window") {
    // AQE off: AdaptiveSparkPlanExec is a leaf, collect() can't see in.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try Dsir.selectTopK(weights, "doc_id", k = 2)
      .queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"selection must not run a corpus-sized window:\n$plan")
    assert(plan.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"boundary lookup should plan as TakeOrderedAndProject:\n$plan")
  }

  test("importanceWeights fails loud when the target contributes no bigrams") {
    import spark.implicits._
    val tgt = Seq((9L, "solo")).toDF("doc_id", "text")
    val ex = intercept[Throwable] {
      Dsir.importanceWeights(corpus, tgt, "doc_id", "text", buckets = 256)
        .collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("no bigrams"), s"unexpected failure: $msgs")
  }

  test("null-id docs are dropped, never merged into one bogus weight row") {
    import spark.implicits._
    // Two strongly target-like null-id docs: pre-screen they merged in
    // groupBy("id") into ONE row whose summed weight could win a
    // selectTopK slot from a real document.
    val nullRows = Seq("alpha beta alpha beta", "alpha beta alpha beta")
      .toDF("text").withColumn("doc_id", lit(null).cast("long"))
      .select("doc_id", "text")
    val w = Dsir.importanceWeights(corpus.unionByName(nullRows),
      corpus.where(col("doc_id").isin(0L, 1L)), "doc_id", "text", buckets = 256)
    assert(w.where(col("doc_id").isNull).isEmpty)
    assert(w.count() === 5) // docs 0-4, unchanged
    val s = Dsir.scoreWithWeights(corpus.unionByName(nullRows), "doc_id",
      "text", Seq((-1L, 0.5)).toDF("bkt", "weight"), buckets = 256)
    assert(s.where(col("doc_id").isNull).isEmpty)
    assert(s.count() === 5)
  }

  test("duplicate ids RAISE instead of merging two documents' evidence") {
    import spark.implicits._
    val dup = corpus.unionByName(
      Seq((2L, "alpha beta alpha beta")).toDF("doc_id", "text"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Throwable] {
      Dsir.importanceWeights(dup, corpus.where(col("doc_id") === 0L),
        "doc_id", "text", buckets = 256).collect()
    }
    assert(msgs(e1).exists(_.contains("duplicate id")), msgs(e1).mkString("|"))
    val e2 = intercept[Throwable] {
      Dsir.scoreWithWeights(dup, "doc_id", "text",
        Seq((-1L, 0.5)).toDF("bkt", "weight"), buckets = 256).collect()
    }
    assert(msgs(e2).exists(_.contains("duplicate id")), msgs(e2).mkString("|"))
  }

  test("weights are reproducible across runs (sha-derived buckets)") {
    val a = weights.orderBy("doc_id").collect().map(_.toSeq)
    val b = weights.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("scoreWithWeights: out-of-vocabulary features score 0, docs are kept") {
    import spark.implicits._
    // bkt -1 can never be produced (pmod is non-negative), so every
    // feature misses the table: scores must be 0.0 via the left join,
    // and every >= 2-token doc still appears.
    val oov = Seq((-1L, 0.5)).toDF("bkt", "weight")
    val scored = Dsir.scoreWithWeights(corpus, "doc_id", "text",
      oov, buckets = 256).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored === Map(0L -> 0.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0))
  }

  test("scoreWithWeights sums matched bucket weights DECIMAL-exactly") {
    import spark.implicits._
    val docs = Seq((0L, "a b a b")).toDF("doc_id", "text")
    // Doc 0's bigrams: "a b", "b a", "a b" -> buckets h(a b), h(b a).
    val ab = graft.functions.HashFunctions.hash60Local("a b") % 256
    val ba = graft.functions.HashFunctions.hash60Local("b a") % 256
    val wtab = Seq((ab, 0.25), (ba, -0.1)).toDF("bkt", "weight")
    val out = Dsir.scoreWithWeights(docs, "doc_id", "text", wtab,
      buckets = 256).collect().head
    assert(out.getLong(1) === 3L)          // three bigram occurrences
    assert(out.getDouble(2) === 0.4)       // 0.25 + (-0.1) + 0.25
  }
}
