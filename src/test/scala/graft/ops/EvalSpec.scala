package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK: per-query overlap fraction; zero-overlap queries stay present") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L)).toDF("q", "id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (1L, 98L),
      (2L, 97L), (2L, 96L)).toDF("q", "id")
    val r = Eval.recallAtK(exact, approx, "q", "id").collect()
      .map(x => x.getAs[Long]("q") ->
        ((x.getAs[Long]("n_exact"), x.getAs[Long]("n_overlap"),
          x.getAs[Double]("recall")))).toMap
    assert(r(1L) == ((4L, 2L, 0.5)))
    assert(r(2L) == ((2L, 0L, 0.0)))
    assert(r.size == 2)
  }

  test("recallAtK: identical sets give recall 1.0") {
    val s = Seq((7L, 1L), (7L, 2L)).toDF("q", "id")
    val r = Eval.recallAtK(s, s, "q", "id").collect()
    assert(r.length == 1 && r.head.getAs[Double]("recall") == 1.0)
  }

  private def g(rank: Int): BigDecimal =
    BigDecimal(1.0 / (math.log(rank + 1.0) / math.log(2.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("rankingMetrics: hand-checked MRR and nDCG, incl. no-hit and all-hit queries") {
    // q1: hits at ranks 2 and 3 of 3 results; 4 relevant total (k=3)
    // q2: no relevant in results, but relevance set non-empty
    // q3: perfect ranking (all results relevant, n_rel = 2 = results)
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)).toDF("q", "id", "rank")
    val relevant = Seq(
      (1L, 11L), (1L, 12L), (1L, 77L), (1L, 78L),
      (2L, 99L),
      (3L, 30L), (3L, 31L)).toDF("q", "id")
    val m = Eval.rankingMetrics(results, relevant, "q", "id", "rank", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val ndcg1 = ((g(2) + g(3)) / (g(1) + g(2) + g(3))).toDouble
    assert(m(1L) == ((4L, 0.5,
      BigDecimal(ndcg1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m(2L) == ((1L, 0.0, 0.0)))
    assert(m(3L) == ((2L, 1.0, 1.0)))
  }

  test("rankingMetrics: results beyond k are ignored; empty relevance set scores 0") {
    val results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q", "id", "rank")
    val relevant = Seq((1L, 12L)).toDF("q", "id")
    // k=2 cuts the rank-3 hit -> mrr 0, ndcg 0
    val m2 = Eval.rankingMetrics(results, relevant, "q", "id", "rank", k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(m2.toSeq == Seq((1L, 0.0, 0.0)))
    // no relevance rows at all -> query still present, zeros
    val empty = Seq.empty[(Long, Long)].toDF("q", "id")
    val m0 = Eval.rankingMetrics(results, empty, "q", "id", "rank", k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(m0.toSeq == Seq((0L, 0.0, 0.0)))
  }

  test("rankingMetrics composes with a real search path (same-label relevance)") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).cache()
    try {
      val queries = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val hits = graft.index.VectorIndex.topKBatch(
        emb, "embedding", queries, "qid", "qvec", k = 5,
        tieBreak = Seq("vec_id"), roundScale = 6,
        keep = Some(col("vec_id") =!= col("qid")))
      val relevant = emb.select(col("vec_id").as("qid"), col("label"))
        .join(emb.select(col("vec_id"), col("label")), "label")
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
      val m = Eval.rankingMetrics(
        hits.select(col("qid"), col("vec_id"), col("rank")),
        relevant, "qid", "vec_id", "rank", k = 5)
      val rows = m.collect()
      assert(rows.length == 50)
      assert(rows.forall { r =>
        val (mrr, ndcg) = (r.getDouble(2), r.getDouble(3))
        mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0
      })
      // with 10 labels over 50 vectors some neighbor should be relevant
      assert(rows.exists(_.getDouble(2) > 0.0))
    } finally { emb.unpersist(); () }
  }

  test("rankingMetrics: a duplicated hit can't score above a perfect ranking") {
    // The same relevant id surfaced at ranks 1 AND 2 (two IVF probes /
    // two LSH bands): without the (query, id) min-rank dedup, DCG sums
    // the gain twice while IDCG caps at the 1 distinct hit — nDCG 1.63.
    val dup = Seq((1L, 10L, 1), (1L, 10L, 2), (1L, 11L, 3)).toDF("q", "id", "rank")
    val relevant = Seq((1L, 10L)).toDF("q", "id")
    val m = Eval.rankingMetrics(dup, relevant, "q", "id", "rank", k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(m.toSeq == Seq((1L, 1.0, 1.0))) // == the perfect ranker, not better
    // duplicate at WORSE ranks keeps first-hit semantics: hit at 2 and 3
    val dup2 = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 10L, 3)).toDF("q", "id", "rank")
    val m2 = Eval.rankingMetrics(dup2, relevant, "q", "id", "rank", k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(m2.toSeq == Seq((1L, 0.5,
      (g(2) / g(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }
}
