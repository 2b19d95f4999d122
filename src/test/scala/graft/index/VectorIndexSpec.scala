package graft.index

import graft.SparkSpec

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  // Unit vectors at known angles from e1.
  private val docs = Seq(
    (0L, Seq(1.0, 0.0)),           // cos=1.0
    (1L, Seq(0.8, 0.6)),           // cos=0.8
    (2L, Seq(0.0, 1.0)),           // cos=0.0
    (3L, Seq(-1.0, 0.0)),          // cos=-1.0
    (4L, Seq(0.6, 0.8))            // cos=0.6
  ).toDF("id", "vec")

  private val e1 = Seq(1.0, 0.0)

  test("topK cosine: correct members and order") {
    val r = VectorIndex.topK(docs, "vec", e1, 3, "cosine", tieBreak = Seq("id"))
      .select("id").as[Long].collect()
    assert(r.toSeq == Seq(0L, 1L, 4L))
  }

  test("topK l2: ascending distance") {
    val r = VectorIndex.topK(docs, "vec", e1, 2, "l2",
        scoreCol = "dist", tieBreak = Seq("id"))
      .select("id").as[Long].collect()
    assert(r.toSeq == Seq(0L, 1L))
  }

  test("topK ip equals cosine here (unit vectors)") {
    val r = VectorIndex.topK(docs, "vec", e1, 3, "ip", tieBreak = Seq("id"))
      .select("id").as[Long].collect()
    assert(r.toSeq == Seq(0L, 1L, 4L))
  }

  test("topKBatch: per-query top-k in one job matches single-query topK") {
    val queries = Seq(("q1", Seq(1.0, 0.0)), ("q2", Seq(0.0, 1.0))).toDF("qid", "qv")
    val r = VectorIndex.topKBatch(docs, "vec", queries, "qid", "qv", 2,
        "cosine", tieBreak = Seq("id"))
      .select("qid", "rank", "id").as[(String, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(r("q1") == Seq(0L, 1L))
    assert(r("q2") == Seq(2L, 4L))
  }

  test("topKBatch enforces its query-batch budgets loudly (rows and bytes)") {
    val queries = Seq(("q1", Seq(1.0, 0.0)), ("q2", Seq(0.0, 1.0)),
      ("q3", Seq(0.5, 0.5))).toDF("qid", "qv")
    // Row budget: 3 queries against a 2-row budget must fail BEFORE any
    // broadcast, naming the budget — not OOM executors at scale.
    val eRows = intercept[IllegalArgumentException] {
      VectorIndex.topKBatch(docs, "vec", queries, "qid", "qv", 1,
        maxBatchRows = 2)
    }
    assert(eRows.getMessage.contains("2-row budget"), eRows.getMessage)
    // Byte budget: three tiny rows still estimate to > 64 bytes of JVM
    // objects on the driver.
    val eBytes = intercept[IllegalArgumentException] {
      VectorIndex.topKBatch(docs, "vec", queries, "qid", "qv", 1,
        maxBatchBytes = 64L)
    }
    assert(eBytes.getMessage.contains("64-byte"), eBytes.getMessage)
    // At-budget passes and results are unchanged vs default budgets.
    val got = VectorIndex.topKBatch(docs, "vec", queries, "qid", "qv", 1,
        "cosine", tieBreak = Seq("id"), maxBatchRows = 3)
      .select("qid", "id").as[(String, Long)].collect().toMap
    assert(got == Map("q1" -> 0L, "q2" -> 2L, "q3" -> 1L))
    // Int.MaxValue disables the row gate without overflowing the
    // probe into limit(negative).
    assert(VectorIndex.topKBatch(docs, "vec", queries, "qid", "qv", 1,
      "cosine", tieBreak = Seq("id"), maxBatchRows = Int.MaxValue)
      .count() == 3)
  }

  test("mmr diversifies: picks relevance first, then trades against redundancy") {
    // relevance order vs e1: 0 (1.0), 1 (0.8), 4 (0.6), 2 (0.0), 3 (-1.0)
    // pure top-3 = {0, 1, 4}; but 1 and 4 are close to each other
    // (cos(1,4)=0.96), while 2 is orthogonal to everything picked.
    val pure = VectorIndex.topK(docs, "vec", e1, 3, "cosine",
      tieBreak = Seq("id")).select("id").as[Long].collect().toSeq
    assert(pure == Seq(0L, 1L, 4L))
    val diverse = VectorIndex.mmr(docs, "vec", e1, k = 3, fetchK = 5,
        lambdaParam = 0.5, idCol = "id")
      .orderBy("rank").select("id").as[Long].collect().toSeq
    // rank 1 = most relevant (0); then 1 beats the tied 4 by id; then
    // the ANTIPODAL 3 wins (negative redundancy: 0.5*(-1)-0.5*(-0.8)
    // = -0.1 beats orthogonal 2's -0.3 and redundant 4's -0.18) —
    // signed-cosine MMR rewards anti-correlation, and the redundant
    // near-duplicate 4 is displaced.
    assert(diverse == Seq(0L, 1L, 3L))
    assert(!diverse.contains(4L))
    // lambda = 1.0 reduces to pure relevance ranking
    val pureLambda = VectorIndex.mmr(docs, "vec", e1, k = 3, fetchK = 5,
        lambdaParam = 1.0, idCol = "id")
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(pureLambda == pure)
    // output carries ranks 1..k and the candidates' rounded qsim
    val rows = VectorIndex.mmr(docs, "vec", e1, k = 2, fetchK = 5, idCol = "id")
      .orderBy("rank").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.head.getDouble(2) == 1.0)
  }

  test("undefined scores never match: zero-vector NaN and null vectors excluded uniformly") {
    import org.apache.spark.sql.functions.{col, lit}
    // id 10 is the zero vector -> cosine = 0/0 = NaN, which Spark
    // orders ABOVE every real double; id 11 has a null vector -> null
    // score. Without the usable() guard, 10 would be rank 1 of every
    // cosine top-k and would pass every `>= threshold` radius test.
    val poisoned = docs
      .unionByName(Seq((10L, Seq(0.0, 0.0))).toDF("id", "vec"))
      .unionByName(Seq(11L).toDF("id")
        .withColumn("vec", lit(null).cast("array<double>")))
    val top = VectorIndex.topK(poisoned, "vec", e1, 3, "cosine",
      tieBreak = Seq("id")).select("id").as[Long].collect().toSeq
    assert(top == Seq(0L, 1L, 4L))
    val rad = VectorIndex.radiusSearch(poisoned, "vec", e1, -1.5, "cosine")
      .select("id").as[Long].collect().toSeq.sorted
    assert(rad == Seq(0L, 1L, 2L, 3L, 4L))
    // The k=1 min_by path and the k>1 window path order null/NaN
    // OPPOSITELY inside their sort keys; the shared filter is what
    // makes their rank-1 rows agree.
    val queries = Seq(("q1", Seq(1.0, 0.0))).toDF("qid", "qv")
    def rank1(k: Int): Long = VectorIndex.topKBatch(poisoned, "vec",
        queries, "qid", "qv", k, "cosine", tieBreak = Seq("id"))
      .where(col("rank") === 1).select("id").as[Long].head
    assert(rank1(1) == 0L)
    assert(rank1(2) == 0L)
  }

  test("mmr rejects a non-Long id column up front, not CCE at collect") {
    val strIds = Seq(("a", Seq(1.0, 0.0)), ("b", Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.mmr(strIds, "vec", e1, k = 1, fetchK = 2, idCol = "id")
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("mmr survives duplicate ids in the candidate set (no empty-minBy crash)") {
    // Two rows share id 1 (a corrupted-upstream shape): picking id 1
    // removes BOTH copies from the remaining pool, so a loop gated on
    // picked.size vs candidate COUNT would run one extra iteration
    // into minBy-on-empty. The walk must instead stop when the pool
    // drains, returning the distinct picks.
    val dup = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val r = VectorIndex.mmr(dup, "vec", e1, k = 3, fetchK = 3, idCol = "id")
      .select("id").as[Long].collect().toSeq
    assert(r.distinct == r, s"duplicate pick: $r")
    assert(r.toSet == Set(1L, 2L))
  }

  test("tie-break is deterministic") {
    val tied = Seq((5L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), (9L, Seq(1.0, 0.0)))
      .toDF("id", "vec")
    val r = VectorIndex.topK(tied, "vec", e1, 2, "cosine", tieBreak = Seq("id"))
      .select("id").as[Long].collect()
    assert(r.toSeq == Seq(3L, 5L))
  }

  test("maxSimTopK scores a doc by its best chunk, not its average") {
    // doc 1: one perfect chunk + one orthogonal; doc 2: two mediocre
    // chunks; doc 3: all orthogonal. Mean-pooling would rank 2 over 1.
    val n = math.sqrt(2.0) / 2.0
    val chunks = Seq(
      (1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(n, n)), (2L, Seq(n, n)),
      (3L, Seq(0.0, 1.0))).toDF("doc", "vec")
    val got = VectorIndex.maxSimTopK(chunks, "doc", "vec", Seq(1.0, 0.0), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1.0, 2L), (2L, 0.7071, 2L), (3L, 0.0, 1L)),
      got.toSeq)
    // degenerate one-chunk-per-doc == single-vector topK ranking
    val single = chunks.groupBy("doc").agg(
      org.apache.spark.sql.functions.first("vec").as("vec"))
    val viaMax = VectorIndex.maxSimTopK(single, "doc", "vec", Seq(1.0, 0.0), k = 2)
      .select("doc").as[Long].collect().toSeq
    val viaTopK = VectorIndex.topK(single, "vec", Seq(1.0, 0.0), 2, "cosine",
        tieBreak = Seq("doc"), roundScale = 4)
      .select("doc").as[Long].collect().toSeq
    assert(viaMax == viaTopK)
    // l2 metric: best chunk = smallest distance, ascending rank
    val l2 = VectorIndex.maxSimTopK(chunks, "doc", "vec", Seq(1.0, 0.0), k = 3,
        metric = "l2")
      .select("doc").as[Long].collect().toSeq
    assert(l2.head == 1L, l2)
  }
}
