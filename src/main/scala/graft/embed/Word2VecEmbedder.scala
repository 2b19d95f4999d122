package graft.embed

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Word2Vec-backed embedder — the second MLlib path from the blueprint
  * (SURVEY §7.1: "HashingTF+IDF / Word2Vec"), standing in for the
  * reference's pluggable LangChain embedding model
  * (reference: src/langchain_memvid/index.py:119-122). Dense
  * distributional vectors: words that co-occur get nearby vectors, and
  * a document embeds as the L2-normalized MEAN of its known word
  * vectors (the same composition MLlib's own transform applies).
  *
  * Spark-first embed path: tokenize → explode → broadcast-join the
  * (word, vector) table → exact fixed-point mean pool
  * ([[graft.ops.Pooling]]) → normalize. The word-vector table is
  * vocabulary-sized (tiny next to any corpus), so the join broadcasts;
  * the pool is the one shuffle. Out-of-vocabulary tokens drop out;
  * documents with NO known tokens embed as the zero vector.
  *
  * `fit` is explicit and reusable (fit once on a sample, reuse across
  * ingests); `save`/`load` persist the (word, vector) table itself, so
  * a loaded embedder needs no MLlib model object at all.
  */
final case class Word2VecEmbedder(dim: Int = 64, minCount: Int = 1,
                                  seed: Long = 42L) extends Embedder {
  require(dim > 0, "dim must be positive")

  @transient private[embed] var wordVecs: Option[DataFrame] = None
  @transient private var queryMap: Option[Map[String, Array[Double]]] = None

  private def vecsOrThrow: DataFrame = wordVecs.getOrElse(
    throw new IllegalStateException(
      "Word2VecEmbedder: call fit(corpus) or load(path) before embedding"))

  /** The shared tokenization of fit/embed/embedQuery — ONE definition
    * in the companion so the batch and broadcast-streaming paths can't
    * drift (see [[Word2VecEmbedder.tokensCol]]). */
  private def tokensCol(text: Column): Column =
    Word2VecEmbedder.tokensCol(text)

  /** Fit word vectors on a corpus column (one MLlib Word2Vec fit). */
  def fit(df: DataFrame, textCol: String): Word2VecEmbedder = {
    val toks = df.select(tokensCol(col(textCol)).as("__toks"))
    val model = new Word2Vec()
      .setInputCol("__toks").setOutputCol("__vec")
      .setVectorSize(dim).setMinCount(minCount).setSeed(seed)
      .fit(toks)
    wordVecs = Some(model.getVectors
      .select(col("word").as("__w"),
        org.apache.spark.ml.functions.vector_to_array(col("vector"))
          .as("__wv"))
      .cache())
    queryMap = None
    this
  }

  // embed() caches/counts its input and joins through an aggregate —
  // batch-only by construction (see Embedder.streamingSafe).
  override def streamingSafe: Boolean = false

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val vecs = vecsOrThrow
    // The row id must agree between the two plan branches that join
    // below (the exploded tokens and the original rows): cache + eager
    // count pins ONE evaluation of the nondeterministic id before
    // either branch reads, so a recomputed branch (shuffle retry, AQE
    // re-plan) cannot re-number rows. The cached blocks live as long as
    // the returned plan references them and are reclaimed by Spark's
    // ContextCleaner when the caller drops the result.
    val withId = df.withColumn("__rid", monotonically_increasing_id()).cache()
    withId.count()
    val pooled = graft.ops.Pooling.meanPool(
      withId.select(col("__rid"),
          explode(tokensCol(col(textCol))).as("__w"))
        .join(broadcast(vecs), Seq("__w")),
      "__rid", "__wv")
      .select(col("__rid"), col("mean_vec").as("__mv"))
    withId.join(pooled, Seq("__rid"), "left")
      .withColumn(outCol, VectorFunctions.l2Normalize(
        coalesce(col("__mv"),
          typedlit(Seq.fill(dim)(0.0)))))
      .drop("__rid", "__mv")
  }

  /** Driver twin of SQL `lower()`, byte-for-byte: UTF8String lowercases
    * ASCII-only strings on a byte fast path (locale-independent) but
    * falls back to DEFAULT-locale String.toLowerCase for anything else
    * — so a Locale.ROOT lowercase here would break the bit-identical
    * embed/embedQuery contract on non-ASCII text under e.g. tr_TR
    * (and a default-locale lowercase alone would break it on ASCII:
    * 'I'.toLowerCase(tr) is dotless 'ı' where the fast path gives 'i'). */
  private def sqlLower(s: String): String = Word2VecEmbedder.sqlLower(s)

  /** Driver-side single-text embedding, BIT-IDENTICAL to [[embed]] on
    * the same text (the Embedder contract): same tokenization, and the
    * mean goes through the SAME 1e-6 fixed-point truncation + 6 dp
    * HALF_UP rounding as Pooling.meanPool before normalizing — a raw
    * double mean would differ in the last ulps and shift scores. The
    * vocabulary map materializes lazily once (vocabulary-sized). */
  override def embedQuery(text: String): Array[Double] =
    Word2VecEmbedder.poolTokens(vocabMap, dim,
      Word2VecEmbedder.driverTokens(text))

  private def vocabMap: Map[String, Array[Double]] =
    queryMap.getOrElse {
      val m = vecsOrThrow.collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
      queryMap = Some(m)
      m
    }

  /** Snapshot the fitted vocabulary into a Spark broadcast and return
    * the STREAMING-SAFE twin: same vectors, same fixed-point mean-pool
    * kernel, but [[BroadcastWord2VecEmbedder.embed]] is a pure narrow
    * map (no cache/count/join over its input), so it runs inside a
    * streaming micro-batch plan. Bounded driver+executor memory:
    * |vocab| × dim doubles, shipped once per executor. Embeddings are
    * bit-identical to this embedder's (spec-pinned): both paths reduce
    * to [[Word2VecEmbedder.poolTokens]] over the same token stream. */
  def broadcastEmbedder(spark: SparkSession): BroadcastWord2VecEmbedder =
    new BroadcastWord2VecEmbedder(dim,
      spark.sparkContext.broadcast(vocabMap))

  /** Persist the fitted (word, vector) table, stamped with this
    * embedder's fit hyperparameters (constant columns on a
    * vocabulary-sized table cost nothing) so a loaded instance can be
    * RE-fit reproducibly — load used to reconstruct with default
    * minCount/seed, silently training a different vocabulary on the
    * next fit. */
  def save(spark: SparkSession, path: String): Unit =
    vecsOrThrow
      .withColumn("__minCount", lit(minCount))
      .withColumn("__seed", lit(seed))
      .write.mode("overwrite").parquet(path)
}

object Word2VecEmbedder {
  /** Restore a fitted embedder from [[Word2VecEmbedder.save]] output,
    * including its fit-time minCount/seed (tables written before those
    * columns existed load with the defaults). An empty vocabulary is
    * refused loudly — there is no dim to infer and every embedding
    * would be the zero vector. */
  def load(spark: SparkSession, path: String): Word2VecEmbedder = {
    val raw = spark.read.parquet(path)
    val hasParams = raw.columns.contains("__minCount")
    val head = raw.limit(1).collect().headOption.getOrElse(
      throw new IllegalStateException(
        s"Word2VecEmbedder.load($path): saved vocabulary is EMPTY — " +
          "re-fit with a lower minCount or a larger corpus"))
    val dim = head.getAs[scala.collection.Seq[Double]]("__wv").length
    val emb =
      if (hasParams)
        Word2VecEmbedder(dim, head.getAs[Int]("__minCount"),
          head.getAs[Long]("__seed"))
      else Word2VecEmbedder(dim)
    emb.wordVecs = Some(raw.select(col("__w"), col("__wv")).cache())
    emb
  }

  /** THE tokenization of every Word2Vec path (fit, batch embed, the
    * broadcast streaming twin): lowercase, whitespace split, empty
    * tokens dropped (a leading-whitespace doc must not put "" into
    * the vocabulary). One definition so the bit-parity contract can't
    * drift between paths. */
  private[embed] def tokensCol(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Driver twin of [[tokensCol]] (sqlLower = byte-for-byte SQL
    * `lower`), shared by both embedQuery paths. */
  private[embed] def driverTokens(text: String): Iterator[String] =
    sqlLower(text).split("\\s+").iterator.filter(_.nonEmpty)

  /** Driver/executor twin of SQL `lower()`, byte-for-byte (see the
    * locale note on [[Word2VecEmbedder]]'s embedQuery). */
  private[embed] def sqlLower(s: String): String =
    if (s.forall(_ < 0x80)) {
      val a = s.toCharArray
      var i = 0
      while (i < a.length) {
        if (a(i) >= 'A' && a(i) <= 'Z') a(i) = (a(i) + 32).toChar
        i += 1
      }
      new String(a)
    } else s.toLowerCase

  /** THE word-vector pooling kernel, shared by every Word2Vec embed
    * path (batch embedQuery, the broadcast streaming twin): keep known
    * tokens, 1e-6 fixed-point micros mean (truncate, then 6 dp HALF_UP
    * — exactly Pooling.meanPool), sequential-fold L2 normalize. A doc
    * with no known token is the ZERO vector (matching the batch
    * plan's coalesce-to-zeros for pool-less rows). One definition so
    * the bit-parity contract can't drift between paths. */
  private[embed] def poolTokens(map: Map[String, Array[Double]], dim: Int,
                                tokens: Iterator[String]): Array[Double] = {
    val hits = tokens.flatMap(map.get).toArray
    val out = new Array[Double](dim)
    if (hits.nonEmpty) {
      val micros = new Array[Long](dim)
      hits.foreach { v =>
        var i = 0
        while (i < dim) { micros(i) += (v(i) * 1e6).toLong; i += 1 }
      }
      var i = 0
      while (i < dim) {
        out(i) = java.math.BigDecimal
          .valueOf(micros(i).toDouble / (1e6 * hits.length))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        i += 1
      }
      var ss = 0.0
      i = 0
      while (i < dim) { ss += out(i) * out(i); i += 1 }
      val n = math.sqrt(ss)
      if (n != 0.0) { i = 0; while (i < dim) { out(i) /= n; i += 1 } }
    }
    out
  }
}

/** STREAMING-SAFE Word2Vec embedding: the trained vocabulary snapshot
  * travels as a Spark broadcast (|vocab| × dim doubles, shipped once
  * per executor) and [[embed]] is a pure narrow map — SQL-side
  * tokenization (bit-identical `lower`/split semantics to the batch
  * path) feeding the shared fixed-point pooling kernel per row. No
  * cache, no count, no join, no aggregate over the input, so it runs
  * inside a Structured Streaming micro-batch plan
  * (`streamingSafe = true`; the batch [[Word2VecEmbedder]] is rejected
  * there — its mean-pool join caches its input).
  *
  * The per-row kernel runs as a Scala UDF over the broadcast map —
  * the documented UDF-tier exception (like the Bloom-filter wrap): a
  * broadcast-map lookup has no built-in Column form, and inlining the
  * vocabulary as a map literal would put |vocab| entries into the
  * expression tree. Embeddings are BIT-IDENTICAL to the batch
  * embedder's output on the same text (both reduce to
  * [[Word2VecEmbedder.poolTokens]]; spec-pinned).
  *
  * Obtain via [[Word2VecEmbedder.broadcastEmbedder]] (fit first).
  * Reference anchor: the pluggable embedding seam, SURVEY §2.6
  * (reference: src/langchain_memvid/index.py:119-122). */
final class BroadcastWord2VecEmbedder private[embed] (
    val dim: Int,
    vocab: org.apache.spark.broadcast.Broadcast[Map[String, Array[Double]]])
  extends Embedder {

  override def streamingSafe: Boolean = true

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val b = vocab
    val d = dim
    val pool = udf((toks: Seq[String]) =>
      if (toks == null) new Array[Double](d)
      else Word2VecEmbedder.poolTokens(b.value, d, toks.iterator))
    df.withColumn(outCol,
      pool(Word2VecEmbedder.tokensCol(col(textCol))))
  }

  override def embedQuery(text: String): Array[Double] =
    Word2VecEmbedder.poolTokens(vocab.value, dim,
      Word2VecEmbedder.driverTokens(text))
}
