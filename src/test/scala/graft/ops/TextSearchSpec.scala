package graft.ops

import graft.SparkSpec

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark is fast"),
    (1L, "spark spark join"),
    (2L, "nothing relevant here at all"),
    (3L, "join the stream"),
    (4L, "spark join stream")
  ).toDF("doc_id", "text")

  private val terms = Seq("spark", "join", "stream")

  /** Independent BM25 reference implementation (plain Scala). */
  private def expected(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val docs = Seq(
      0L -> "spark is fast", 1L -> "spark spark join",
      2L -> "nothing relevant here at all", 3L -> "join the stream",
      4L -> "spark join stream")
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, tk) =>
      val ws = terms.flatMap { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val w = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * tk.size / avgdl))
          Some(BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (ws.isEmpty) None
      else Some(id -> ws.sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("persisted index round-trip: searchIndex == bm25, term filter pushed to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    TextSearch.writeIndex(corpus, "doc_id", "text", dir, numFiles = 3)
    val fromIndex = TextSearch.searchIndex(spark, dir, terms, topK = 10,
        idCol = "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(fromIndex == expected())
    // subset query: df/stats must come from the WHOLE indexed corpus,
    // not the queried terms
    val one = TextSearch.searchIndex(spark, dir, Seq("stream"), topK = 10,
        idCol = "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val oneScan = TextSearch.bm25(corpus, "doc_id", "text", Seq("stream"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(one == oneScan && one.keySet == Set(3L, 4L))
    // the postings scan must carry the term predicate into parquet
    val plan = TextSearch.searchIndex(spark, dir, terms, idCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"))
  }

  test("writeIndex is completeness-marked: a torn rebuild reads as absent, not as wrong scores") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_marker").toString
    assert(!TextSearch.indexComplete(spark, dir))
    TextSearch.writeIndex(corpus, "doc_id", "text", dir, numFiles = 2)
    assert(TextSearch.indexComplete(spark, dir))
    // Simulate the crash window: writeIndex removes the marker FIRST,
    // so any interruption before the last write leaves it absent.
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_complete")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(marker, false)
    assert(!TextSearch.indexComplete(spark, dir))
    // a fresh rebuild restores it
    TextSearch.writeIndex(corpus, "doc_id", "text", dir, numFiles = 2)
    assert(TextSearch.indexComplete(spark, dir))
  }

  test("bm25 scores match an independent reference implementation exactly") {
    val got = TextSearch.bm25(corpus, "doc_id", "text", terms, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got == expected())
  }

  test("docs without any query term are absent; ranking favors more matched terms") {
    val rows = TextSearch.bm25(corpus, "doc_id", "text", terms, topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(!rows.map(_._1).contains(2L))
    val byId = rows.toMap
    assert(byId(4L) > byId(0L)) // 3 matched terms beat 1
  }

  test("topK truncates") {
    assert(TextSearch.bm25(corpus, "doc_id", "text", terms, topK = 2).count() == 2)
  }

  test("hybridRrf fuses two rankings by reciprocal rank, full-outer") {
    // Source A ranks: 10 (1st), 20 (2nd); source B: 20 (1st), 30 (2nd).
    val a = Seq((10L, 0.9), (20L, 0.8)).toDF("doc_id", "score")
    val b = Seq((20L, 5.0), (30L, 4.0)).toDF("doc_id", "score")
    val got = TextSearch.hybridRrf(a, b, "doc_id", perSourceK = 50,
        rrfK = 60, topK = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_a"),
        r.getAs[Long]("rank_b"), r.getAs[Double]("rrf")))
    def rrf6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 is in both lists -> highest fused score; absent ranks are -1.
    assert(got(0) == ((20L, 2L, 1L, rrf6(1.0 / 62 + 1.0 / 61))))
    assert(got(1) == ((10L, 1L, -1L, rrf6(1.0 / 61))))
    assert(got(2) == ((30L, -1L, 2L, rrf6(1.0 / 62))))
  }

  test("hybridRrf ties break by id and perSourceK truncates sources") {
    // Symmetric case: 1 only in A (rank 1), 2 only in B (rank 1) ->
    // equal rrf, id order decides.
    val a = Seq((1L, 1.0)).toDF("doc_id", "score")
    val b = Seq((2L, 1.0)).toDF("doc_id", "score")
    val ids = TextSearch.hybridRrf(a, b, "doc_id").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == Seq(1L, 2L))
    // perSourceK = 1 keeps only the top row of each source.
    val a2 = Seq((1L, 9.0), (2L, 8.0)).toDF("doc_id", "score")
    val b2 = Seq((3L, 9.0), (4L, 8.0)).toDF("doc_id", "score")
    val fused = TextSearch.hybridRrf(a2, b2, "doc_id", perSourceK = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(fused == Set(1L, 3L))
  }

  test("bm25 equals bm25Scores ordered+limited (refactor parity)") {
    val viaTop = TextSearch.bm25(corpus, "doc_id", "text", terms, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaScores = TextSearch.bm25Scores(corpus, "doc_id", "text", terms)
      .orderBy($"score".desc, $"doc_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaTop == viaScores)
  }
}
