package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Normalizer, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-pipeline embedder: Tokenizer -> HashingTF -> IDF -> L2
  * Normalizer, producing unit `array<double>` vectors — the
  * "MLlib for embeddings" path from BASELINE.json, standing in for the
  * reference's pluggable LangChain embedding model
  * (reference: src/langchain_memvid/index.py:119-122).
  *
  * Unlike [[HashEmbedder]] (content-hash vectors for deterministic
  * tests/benchmarks), this produces *semantically meaningful* sparse
  * TF-IDF embeddings: documents sharing terms actually score closer in
  * cosine space. Scale notes: HashingTF is stateless (a narrow map);
  * only the IDF fit is a corpus pass (one treeAggregate job). The
  * fitted model broadcasts to executors — no shuffle at transform time.
  *
  * The reference re-embeds its corpus on every build; here `fit` is
  * explicit so callers can reuse a fitted model across ingests — at
  * 100 TB, re-fitting IDF per micro-batch would be the bottleneck.
  */
final case class MLlibEmbedder(dim: Int = 1024) extends Embedder {
  require(dim > 0, "dim must be positive")

  @transient private var idfModel: Option[IDFModel] = None

  private def tokenizer = new Tokenizer()
    .setInputCol("__graft_text").setOutputCol("__graft_tokens")
  private def hashingTF = new HashingTF()
    .setInputCol("__graft_tokens").setOutputCol("__graft_tf").setNumFeatures(dim)

  /** Fit the IDF weighting on a corpus sample/column. */
  def fit(df: DataFrame, textCol: String): MLlibEmbedder = {
    val prepared = hashingTF.transform(
      tokenizer.transform(df.select(col(textCol).as("__graft_text"))))
    idfModel = Some(new IDF().setInputCol("__graft_tf").setOutputCol("__graft_vec")
      .fit(prepared))
    this
  }

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val model = idfModel.getOrElse(
      throw new IllegalStateException("MLlibEmbedder: call fit(corpus) before embed"))
    val renamed = df.withColumn("__graft_text", col(textCol))
    val tf = hashingTF.transform(tokenizer.transform(renamed))
    val idf = model.transform(tf)
    val normed = new Normalizer().setInputCol("__graft_vec")
      .setOutputCol("__graft_unit").setP(2.0).transform(idf)
    normed
      .withColumn(outCol, vector_to_array(col("__graft_unit")))
      .drop("__graft_text", "__graft_tokens", "__graft_tf", "__graft_vec", "__graft_unit")
  }

  /** Driver-side single-text embedding: replicates
    * Tokenizer (lowercase whitespace split) + HashingTF (murmur3 term
    * hashing, term-frequency counts) + IDF weights + L2 normalization
    * without launching a job. */
  override def embedQuery(text: String): Array[Double] = {
    val model = idfModel.getOrElse(
      throw new IllegalStateException("MLlibEmbedder: call fit(corpus) before embed"))
    val terms = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tf = hashingTF.indexOf _
    val counts = new Array[Double](dim)
    terms.foreach { t => counts(tf(t)) += 1.0 }
    val idf = model.idf.toArray
    var ss = 0.0
    var i = 0
    while (i < dim) { counts(i) *= idf(i); ss += counts(i) * counts(i); i += 1 }
    val n = math.sqrt(ss)
    if (n > 0) { i = 0; while (i < dim) { counts(i) /= n; i += 1 } }
    counts
  }
}
