package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** TRAINED document-quality scoring — the fastText-style linear
  * classifier web-scale pipelines run after the hand-crafted gates
  * (CCNet's LM filtering, the FineWeb/ RefinedWeb "educational value"
  * classifiers; see PAPERS.md). [[QualitySignals]]/[[TextAnalysis]]
  * give fixed heuristics; this learns a weighting from labeled
  * examples (e.g. "wiki-like vs crawl" seed sets) and scores the whole
  * corpus with a pure-projection plan.
  *
  * Model = logistic regression over HASHED bag-of-tokens features:
  * bucket(token) = sha-derived hash60(salt:token) mod numFeatures —
  * the same replayable hash family as every other operator here (NOT
  * murmur, so an external SQL engine reproduces the bucketing), with
  * mean-TF weighting (sum of bucket weights / token count), matching
  * fastText's mean-of-embeddings shape at embedding dim 1 per bucket.
  *
  * Determinism discipline (the BM25 pattern): per-token weights round
  * HALF_UP at `sumScale` and accumulate through EXACT DECIMAL, so
  * token order can't move the sum; the single double division and the
  * sigmoid happen once per document on the decimal total. Engine
  * column, driver mirror and the DuckDB oracle (q_quality_model) agree
  * exactly.
  *
  * Scale posture: scoring is a narrow codegen'd projection over the
  * weights literal (numFeatures doubles shipped once in the plan) —
  * no shuffle, no UDF, no join; TRAINING is sample-sized (labeled
  * seed sets are thousands of rows, not the corpus) and is the one
  * place a UDF builds the sparse feature vectors for MLlib's
  * LogisticRegression — the documented UDF-tier exception, train-only.
  *
  * Reference: no counterpart (the reference ingests verbatim,
  * src/langchain_memvid/encoder.py:54-88) — this is part of the
  * curation surface a 100 TB corpus needs before embedding.
  */
object QualityModel {

  /** A trained (or pinned) scorer: `weights(b)` is the log-odds
    * contribution of hash bucket `b`, `bias` the intercept. */
  final case class Model(weights: IndexedSeq[Double], bias: Double,
                         salt: String = "qm") {
    require(weights.nonEmpty, "need at least one feature bucket")
    def numFeatures: Int = weights.length

    /** 1-based bucket index of a token column (for `element_at`). */
    private def bucket1(t: Column): Column =
      (HashFunctions.hash60(concat(lit(salt), lit(":"), t)) % numFeatures)
        .cast("int") + 1

    /** Quality score in (0, 1): sigmoid(bias + mean token weight).
      * Pure built-ins — sha2/conv hashing, a decimal-exact HOF fold,
      * one division, one exp — fully codegen'd, no UDF. A NULL text
      * scores NULL; a token-less text scores sigmoid(bias). Tokens are
      * single-space splits (the corpus tokenization contract shared
      * with the q_* text oracles). */
    def scoreCol(text: Column, sumScale: Int = 7): Column = {
      val decT = s"decimal(28,$sumScale)"
      val toks = filter(split(text, " "), t => t =!= "")
      val wl = typedlit(weights)
      val total = aggregate(toks, lit(0).cast(decT),
        (acc, t) => (acc + round(element_at(wl, bucket1(t)), sumScale)
          .cast(decT)).cast(decT))
      val n = size(toks)
      val z = lit(bias) +
        when(n > 0, total.cast("double") / n).otherwise(lit(0.0))
      when(text.isNull, lit(null).cast("double"))
        .otherwise(lit(1.0) / (lit(1.0) + exp(-z)))
    }

    /** Driver mirror of [[scoreCol]], bit-identical on the same text
      * (decimal-exact sum, same HALF_UP rounding) — the parity is
      * spec-pinned. */
    def score(text: String, sumScale: Int = 7): Double = {
      require(text != null, "score(null): the column form yields NULL")
      val toks = text.split(" ").filter(_.nonEmpty)
      var total = BigDecimal(0).setScale(sumScale)
      toks.foreach { t =>
        val b = (HashFunctions.hash60Local(s"$salt:$t") % numFeatures).toInt
        total += BigDecimal(weights(b)).setScale(sumScale,
          scala.math.BigDecimal.RoundingMode.HALF_UP)
      }
      val z = bias +
        (if (toks.nonEmpty) total.toDouble / toks.length else 0.0)
      1.0 / (1.0 + math.exp(-z))
    }
  }

  /** Fit a quality model from labeled rows (`labelCol` ∈ {0, 1}; rows
    * with a NULL label are dropped). Features are the same
    * hash60-bucketed mean-TF vectors [[Model.scoreCol]] scores with
    * (built sparse per row inside a train-only UDF), so the fitted
    * weights transfer to the scoring plan with no translation. L2
    * regularization via `regParam` (labeled seed sets are small;
    * regularize when numFeatures approaches the sample size). */
  def train(df: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 4096, salt: String = "qm",
            regParam: Double = 1e-4, maxIter: Int = 100): Model = {
    require(numFeatures > 0, "numFeatures must be positive")
    val f = numFeatures
    val s = salt
    val toVec = udf { (text: String) =>
      val toks =
        if (text == null) Array.empty[String]
        else text.split(" ").filter(_.nonEmpty)
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      toks.foreach { t =>
        val b = (HashFunctions.hash60Local(s"$s:$t") % f).toInt
        m.update(b, m.getOrElse(b, 0.0) + 1.0)
      }
      val n = toks.length.toDouble
      org.apache.spark.ml.linalg.Vectors.sparse(f,
        m.toSeq.sortBy(_._1).map { case (b, c) => (b, c / n) })
    }
    val data = df
      .select(col(labelCol).cast("double").as("label"),
        toVec(col(textCol)).as("features"))
      .where(col("label").isNotNull)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
    val fit = lr.fit(data)
    Model(fit.coefficients.toArray.toIndexedSeq, fit.intercept, salt)
  }
}
