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

  test("weights are reproducible across runs (sha-derived buckets)") {
    val a = weights.orderBy("doc_id").collect().map(_.toSeq)
    val b = weights.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
