package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** MLlib-pipeline embedder: Tokenizer -> HashingTF -> IDF weighting ->
  * L2 normalization, producing unit `array<double>` vectors — the
  * "MLlib for embeddings" path from BASELINE.json, standing in for the
  * reference's pluggable LangChain embedding model
  * (reference: src/langchain_memvid/index.py:119-122).
  *
  * Unlike [[HashEmbedder]] (content-hash vectors for deterministic
  * tests/benchmarks), this produces *semantically meaningful* sparse
  * TF-IDF embeddings: documents sharing terms actually score closer in
  * cosine space.
  *
  * Scale/design notes:
  * - `fit` extracts the raw idf weight vector from MLlib's IDF model;
  *   `embed` then applies it as a pure columnar expression
  *   (tf * idf, L2-normalized) — a narrow map stage with the weights
  *   broadcast in the task closure, no model object on the hot path.
  * - The fit is explicit and reusable: at 100 TB you fit IDF once on a
  *   sample and reuse it across every ingest/micro-batch.
  * - `save`/`load` persist the weights (one-row parquet), completing
  *   store save/load round-trips for MLlib-backed stores.
  */
final case class MLlibEmbedder(dim: Int = 1024) extends Embedder {
  require(dim > 0, "dim must be positive")

  @transient private[embed] var idfWeights: Option[Array[Double]] = None

  private def tokenizer = new Tokenizer()
    .setInputCol("__graft_text").setOutputCol("__graft_tokens")
  private def hashingTF = new HashingTF()
    .setInputCol("__graft_tokens").setOutputCol("__graft_tf").setNumFeatures(dim)

  private def weightsOrThrow: Array[Double] = idfWeights.getOrElse(
    throw new IllegalStateException(
      "MLlibEmbedder: call fit(corpus) or load(path) before embedding"))

  /** Fit the IDF weighting on a corpus column (one corpus pass). */
  def fit(df: DataFrame, textCol: String): MLlibEmbedder = {
    val prepared = hashingTF.transform(
      tokenizer.transform(df.select(col(textCol).as("__graft_text"))))
    val model = new IDF().setInputCol("__graft_tf").setOutputCol("__graft_vec")
      .fit(prepared)
    idfWeights = Some(model.idf.toArray)
    this
  }

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val idfLit = typedlit(weightsOrThrow.toSeq)
    // Tokenizer's lowercase UDF NPEs on a null input (the one embedder
    // in the family that would abort the job on a null-text doc):
    // screen nulls through an empty string for the pipeline, then NULL
    // the OUTPUT vector — the HashEmbedder null-text contract, which
    // the store's null-vec discipline already handles everywhere.
    val renamed = df.withColumn("__graft_text",
      coalesce(col(textCol), lit("")))
    val tf = hashingTF.transform(tokenizer.transform(renamed))
    tf.withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("array<double>"))
          .otherwise(VectorFunctions.l2Normalize(
            zip_with(vector_to_array(col("__graft_tf")), idfLit, (t, w) => t * w))))
      .drop("__graft_text", "__graft_tokens", "__graft_tf")
  }

  /** Driver-side single-text embedding: replicates Tokenizer + HashingTF
    * (murmur3 term hashing, TF counts) + idf weighting + L2
    * normalization without launching a job. Tokenization is the EXACT
    * Tokenizer expression — default-locale toLowerCase then
    * split("\\s"), which KEEPS empty tokens from leading/consecutive
    * whitespace (they hash into a bucket like any term); dropping them
    * here would break the bit-identity contract with [[embed]]. */
  override def embedQuery(text: String): Array[Double] = {
    require(text != null,
      "embedQuery(null): null text embeds as a NULL vector in the column form")
    val idf = weightsOrThrow
    val terms = text.toLowerCase.split("\\s").toSeq
    val counts = new Array[Double](dim)
    terms.foreach { t => counts(hashingTF.indexOf(t)) += 1.0 }
    var ss = 0.0
    var i = 0
    while (i < dim) { counts(i) *= idf(i); ss += counts(i) * counts(i); i += 1 }
    val n = math.sqrt(ss)
    if (n > 0) { i = 0; while (i < dim) { counts(i) /= n; i += 1 } }
    counts
  }

  /** Persist the fitted idf weights. */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    Seq((dim, weightsOrThrow.toSeq)).toDF("dim", "idf")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

object MLlibEmbedder {
  /** Restore a fitted embedder from [[MLlibEmbedder.save]] output. */
  def load(spark: SparkSession, path: String): MLlibEmbedder = {
    val row = spark.read.parquet(path).head
    val emb = MLlibEmbedder(row.getAs[Int]("dim"))
    emb.idfWeights = Some(row.getSeq[Double](row.fieldIndex("idf")).toArray)
    emb
  }
}
