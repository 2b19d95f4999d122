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
}
