package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val model = QualityModel.Model(
    IndexedSeq(0.8, -0.5, 0.25, -0.125, 1.5, -2.0, 0.0, 0.375),
    bias = 0.1, salt = "spec")

  test("scoreCol == driver score bitwise; empty text scores sigmoid(bias); null scores null") {
    val texts = Seq(
      "the quick brown fox", "spam spam spam buy now", "a", "",
      "mixed bag of many different tokens here",
      "repeated repeated repeated repeated")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val engine = df.withColumn("s", model.scoreCol(col("text")))
      .orderBy("id").select("s").as[Double].collect().toSeq
    val driver = texts.map(model.score(_))
    assert(engine == driver)
    // Token-less text: mean term is 0, score = sigmoid(bias) exactly.
    assert(model.score("") == 1.0 / (1.0 + math.exp(-0.1)))
    val nullScore = Seq((0L, null: String)).toDF("id", "text")
      .select(model.scoreCol(col("text"))).head
    assert(nullScore.isNullAt(0))
  }

  test("score is token-order independent (decimal-exact sum)") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val perms = Seq(toks, toks.reverse, scala.util.Random.shuffle(toks))
    val scores = perms.map(p => model.score(p.mkString(" ")))
    assert(scores.distinct.size == 1, s"order moved the score: $scores")
  }

  test("train separates a synthetic good/bad corpus and transfers to scoreCol") {
    val rnd = new scala.util.Random(31)
    val good = Seq("science", "research", "theory", "analysis", "study",
      "method", "result", "evidence")
    val bad = Seq("buy", "click", "free", "winner", "casino", "pills",
      "offer", "now")
    def doc(vocab: Seq[String]): String =
      Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val rows = (0 until 200).map { i =>
      val label = i % 2
      (i.toLong, doc(if (label == 1) good else bad), label)
    }
    val (trainRows, testRows) = rows.splitAt(160)
    val m = QualityModel.train(trainRows.toDF("id", "text", "label"),
      "text", "label", numFeatures = 256, salt = "fit")
    assert(m.numFeatures == 256)
    val scored = testRows.toDF("id", "text", "label")
      .withColumn("s", m.scoreCol(col("text")))
      .select("label", "s").as[(Int, Double)].collect()
    val acc = scored.count { case (l, s) =>
      (s >= 0.5) == (l == 1) }.toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // The fitted weights transfer verbatim: driver mirror agrees with
    // the engine column on the fitted model too.
    val t = testRows.head._2
    assert(m.score(t) ==
      Seq(Tuple1(t)).toDF("text").select(m.scoreCol(col("text")))
        .head.getDouble(0))
  }

  test("rows with a null label are dropped from training, not crashed on") {
    val rows = Seq(
      (0L, "science research", java.lang.Integer.valueOf(1)),
      (1L, "buy now", java.lang.Integer.valueOf(0)),
      (2L, "unlabeled text", null: java.lang.Integer),
      (3L, "theory analysis", java.lang.Integer.valueOf(1)),
      (4L, "casino pills", java.lang.Integer.valueOf(0)))
    val m = QualityModel.train(rows.toDF("id", "text", "label"),
      "text", "label", numFeatures = 64, salt = "n")
    assert(m.numFeatures == 64)
  }
}
