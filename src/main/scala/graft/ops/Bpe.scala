package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * PAPERS.md) — the tokenizer-construction step of an LLM data
  * pipeline, split the way production trainers split it:
  *
  *  - the CORPUS pass (word frequency counting) is distributed — one
  *    explode + hash-shuffle groupBy over however many TB of text;
  *  - the merge LOOP runs over the (word, count) vocabulary on the
  *    driver — the vocabulary is MBs where the corpus is TBs, and the
  *    loop is inherently sequential (each merge depends on the last).
  *
  * Determinism: pair counts are exact longs; frequency ties break to
  * the lexicographically smallest (left, right) pair, so the merge
  * table is a pure function of the corpus.
  */
object Bpe {

  /** A learned merge table: ordered (left, right) symbol pairs. */
  type Merges = IndexedSeq[(String, String)]

  /** Train `numMerges` merges on a text column. Characters are the
    * initial symbols (word-internal BPE). The pre-pass is LOWERCASE +
    * whitespace split — exactly what [[encodeCol]] applies, so the
    * trained vocabulary and the encoder see identical words (a
    * case-preserving trainer would learn merges the lowercasing
    * encoder could never fire).
    *
    * Driver-memory bound: the merge loop runs over the (word, count)
    * vocabulary on the driver, and a web-scale corpus has a long-tail
    * vocabulary (typos, ids, urls) that can blow the driver heap if
    * collected whole. `minCount` drops words seen fewer times (standard
    * BPE practice — Sennrich's learn_bpe has the same knob) and
    * `maxVocab` keeps only the top-N words by count (ties to the
    * lexicographically smaller word, so the kept set is deterministic);
    * both cut BEFORE the collect, so the driver holds at most
    * `maxVocab` rows no matter the corpus size. Tail words contribute
    * ~nothing to pair counts, so merges are stable under reasonable
    * cutoffs — but they are a different (smaller) training set, so
    * extreme cutoffs can change late merges. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 1L, maxVocab: Int = 0): Merges = {
    require(minCount >= 1L, "minCount must be >= 1")
    var vocab = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    if (minCount > 1L) vocab = vocab.where(col("c") >= minCount)
    if (maxVocab > 0)
      vocab = vocab.orderBy(col("c").desc, col("w")).limit(maxVocab)
    val wordCounts = vocab
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    trainFromCounts(wordCounts, numMerges)
  }

  /** Initial symbols of a word: one per Unicode CODE POINT, not per
    * UTF-16 char. `w.map(_.toString)` split astral characters (emoji,
    * CJK extensions) into lone surrogates: the trainer counted
    * cross-character (lo,hi) surrogate pairs as merge candidates, and
    * any lone surrogate surviving to [[encodeCol]] output was
    * serialized by UTF8String.fromString as '?' — distinct astral
    * characters collided into identical corrupt tokens. */
  private[ops] def symbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var j = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      j += 1
    }
    out
  }

  /** The driver-side merge loop over a (word, count) vocabulary. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int): Merges = {
    var words: Array[(Array[String], Long)] = wordCounts
      .map { case (w, c) => (symbols(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
      round += 1
    }
    merges.toIndexedSeq
  }

  /** Encode one word with a learned merge table (merges applied in
    * training order — the standard greedy BPE segmenter). */
  def encodeWord(word: String, merges: Merges): Seq[String] = {
    var syms: Array[String] = symbols(word)
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms.toSeq
  }

  /** Subword-tokenize a text column with a learned merge table: one
    * narrow pass; the merge table rides inside the expression (it is
    * numMerges-sized). Emits `array<string>` of subword tokens.
    * A fused expression, not a UDF (the repo posture everywhere):
    * CodegenFallback like HashEmbedExpr — one JVM call per row doing
    * primitive array work. */
  def encodeCol(text: org.apache.spark.sql.Column,
                merges: Merges): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BpeEncodeExpr(org.apache.spark.sql.GraftSqlBridge.expression(text), merges))

  /** The merge table as a DataFrame (rank, left, right) — persist it
    * next to the corpus it was trained on. */
  def mergesDF(spark: SparkSession, merges: Merges): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }

  /** Shared compiled whitespace splitter for [[BpeEncodeExpr]] —
    * `String.split("\\s+")` recompiles the pattern per call, which a
    * per-row fused expression must not pay. */
  private[ops] val Whitespace: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")
}

/** Fused BPE segmentation of one text row: lowercase + whitespace
  * split (the SAME pre-pass [[Bpe.train]] counts words with — both
  * sides go through Java's \s+ regex) then greedy training-order
  * merges per word. */
private[ops] case class BpeEncodeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Bpe.Merges)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  // Word -> encoded tokens memo. encodeWord rescans the FULL merge
  // table per call (O(numMerges x wordLen)); word frequency is Zipfian,
  // so the same few thousand words dominate any real corpus and the
  // rescan is ~10-100x redundant work on the hot path. ThreadLocal
  // (tasks share nothing, no contention) + access-order LRU bounded at
  // CacheMaxWords entries keeps memory flat no matter the vocabulary's
  // long tail. UTF8String values are immutable — sharing the cached
  // instances across output rows is safe.
  @transient private lazy val wordCache =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[AnyRef]]] {
      override def initialValue(): java.util.LinkedHashMap[String, Array[AnyRef]] =
        new java.util.LinkedHashMap[String, Array[AnyRef]](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[AnyRef]]): Boolean =
            size() > BpeEncodeExpr.CacheMaxWords
        }
    }

  override protected def nullSafeEval(input: Any): Any = {
    // Lowercase on the UTF8String ITSELF — the exact code path SQL
    // lower() runs (ASCII byte fast path, locale-independent), so the
    // encoder sees byte-identical words to the ones train() counted.
    // A String.toLowerCase here would diverge under e.g. a tr_TR
    // default locale ('I' -> dotless 'ı') and break determinism
    // across executor JVMs with different locales.
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString
    val cache = wordCache.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    val words = Bpe.Whitespace.split(text)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var toks = cache.get(w)
        if (toks == null) {
          toks = Bpe.encodeWord(w, merges)
            .map(org.apache.spark.unsafe.types.UTF8String.fromString)
            .toArray[AnyRef]
          cache.put(w, toks)
        }
        var j = 0
        while (j < toks.length) { buf += toks(j); j += 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

private[ops] object BpeEncodeExpr {
  /** Per-thread memo bound. 64k words x (string + a few tokens) is a
    * couple MB per task thread — flat regardless of corpus size. */
  val CacheMaxWords = 65536
}
