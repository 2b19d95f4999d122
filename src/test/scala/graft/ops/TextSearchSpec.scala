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
}
