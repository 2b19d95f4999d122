package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct word-n-gram shingling — replaces the interpreted
  * split -> transform -> concat_ws -> array_distinct pipeline of
  * `TextFunctions.shinglesSql` with one JVM pass per row. MUST stay
  * value-identical to the SQL form (asserted in TextFunctionsSpec;
  * the DuckDB oracles replicate the SQL form):
  * - tokens: split on single space, trailing empties kept (Java
  *   split(" ", -1), same as Spark's split with limit -1);
  * - fewer than n tokens -> empty array;
  * - shingle i = tokens[i..i+n) joined by one space;
  * - distinct, first occurrence order.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {
  require(n > 0, "shingle size must be positive")

  // Declared input (r12, for the SQL surface): without it a non-string
  // child passes analysis and the UTF8String cast CCEs inside every
  // task — the same lesson the vector kernels already encode. The
  // bridge trait exists because AbstractDataType is private[sql].
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash signature: one JVM pass over the shingle array — one
  * sha256 per shingle, then all `numHashes` affine rehashes
  * (a_s*h0 + b_s) mod P updated in a single loop. Replaces the
  * interpreted let1(transform(...)) HOF pipeline of
  * `TextFunctions.minhashSignatureFromShingles`; MUST stay
  * value-identical to it (parity asserted in TextFunctionsSpec; the
  * DuckDB oracle replicates the HOF form):
  * - h0 = hash60(shingle) mod P (P = largest prime < 2^30);
  * - sig_s = min over shingles of (a_s*h0 + b_s) mod P;
  * - empty input -> Long.MaxValue in every slot.
  * CodegenFallback: sha256 dominates; codegen would fuse only the cheap
  * arithmetic around it.
  */
private[functions] object MinHashKernel {
  def signature(input: Any, numHashes: Int,
                coefA: Array[Long], coefB: Array[Long]): Array[Long] = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val p = TextFunctions.MinhashP
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      // Skip null elements like the HOF twin does (a null shingle's
      // rehash is null, which array_min ignores) — getUTF8String on a
      // null slot would NPE the task instead.
      if (!arr.isNullAt(i)) {
        val h0 = HashFunctions.hash60Parts(arr.getUTF8String(i).getBytes) % p
        var s = 0
        while (s < numHashes) {
          val v = (coefA(s) * h0 + coefB(s)) % p
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    sig
  }

  def coeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val (as, bs) = TextFunctions.minhashCoeffs(numHashes)
    (as.toArray, bs.toArray)
  }
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.ArrayStringUnaryInputs {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val (coefA, coefB) = MinHashKernel.coeffs(numHashes)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashKernel.signature(input, numHashes, coefA, coefB).map(v => v: Any))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash LSH band keys: the signature of [[MinHashSigExpr]]
  * sliced into `bands` bands of r = numHashes/bands values, each
  * rendered as "bandId|v0|v1|...|v{r-1}" — the exact string the
  * interpreted banding pipeline in Dedup.minhashLshPairs builds (parity
  * asserted in TextFunctionsSpec). Emitting the band keys from the same
  * fused pass avoids re-evaluating the signature per band (Catalyst's
  * projection collapse would otherwise duplicate it). */
case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.ArrayStringUnaryInputs {
  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    "bands must divide numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  @transient private lazy val (coefA, coefB) = MinHashKernel.coeffs(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val sig = MinHashKernel.signature(input, numHashes, coefA, coefB)
    val r = numHashes / bands
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      sb.append(b)
      var i = 0
      while (i < r) {
        sb.append('|').append(sig(b * r + i))
        i += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused Gopher n-gram repetition MASSES — one JVM pass per row over
  * the token array, replacing the interpreted
  * sort -> run-length-fold -> span-union HOF pipeline of
  * [[graft.ops.QualitySignals.ngramCharSignals]]'s reference form with
  * imperative loops (the quality gate runs over EVERY document of a
  * corpus; per-element lambda interpretation is the hot-path tax the
  * repo's expression tier exists to remove).
  *
  * Returns INTEGER masses only — `struct<tot_chars, top_mass_{n}...,
  * dup_mass_{n}...>`, all longs; the fraction (divide + round) stays in
  * plain SQL on top, so parity with the HOF reference form is exact
  * long equality (no float subtleties), asserted in PropertySpec.
  * Value contract (identical to the HOF form and the DuckDB oracle):
  *  - tokens: split on single space, trailing empties kept
  *    (split(" ", -1) — the repo tokenization contract, ShinglesExpr);
  *  - char mass counts CODE POINTS of token chars only (Spark
  *    `length()` semantics — NOT UTF-16 units), separators excluded;
  *  - top_mass_n: max over grams occurring >= 2 times of
  *    occurrences x gram token chars (0 when no gram repeats or m < n);
  *  - dup_mass_n: token chars covered by >= 1 occurrence of a
  *    duplicated n-gram, overlapping spans counted once.
  * Sort basis is position-index sort with (hash, token-wise) gram
  * comparison — a different total order than the HOF form's string
  * sort, which is fine: any total order groups equal grams adjacently,
  * and grams joined with a separator that tokens cannot contain are
  * equal iff their token sequences are.
  * CodegenFallback like [[ShinglesExpr]]: the loops dominate; codegen
  * would fuse only the cheap struct wrap. */
case class NgramRepetitionExpr(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {
  require(topNs.nonEmpty || dupNs.nonEmpty, "at least one n-gram size")
  require((topNs ++ dupNs).forall(_ >= 2), "n-gram sizes must be >= 2")
  require(topNs.distinct == topNs && dupNs.distinct == dupNs,
    "duplicate n-gram sizes would mint ambiguous struct fields")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    org.apache.spark.sql.types.StructField("tot_chars", LongType, nullable = false) +:
      (topNs.map(n => org.apache.spark.sql.types.StructField(
          s"top_mass_$n", LongType, nullable = false)) ++
        dupNs.map(n => org.apache.spark.sql.types.StructField(
          s"dup_mass_$n", LongType, nullable = false))))
  override def prettyName: String = "graft_ngram_repetition"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = toks.length
    // per-token code-point counts + prefix sums (gram mass in O(1))
    val charPrefix = new Array[Long](m + 1)
    var i = 0
    while (i < m) {
      charPrefix(i + 1) =
        charPrefix(i) + toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    val tot = charPrefix(m)
    val out = new Array[Any](1 + topNs.size + dupNs.size)
    out(0) = tot
    var oi = 1
    topNs.foreach { n => out(oi) = topMass(toks, charPrefix, n); oi += 1 }
    dupNs.foreach { n => out(oi) = dupMass(toks, charPrefix, n); oi += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Positions 0..m-n sorted so equal grams are adjacent (hash-first
    * compare, token-wise tiebreak — collisions only slow the compare,
    * never group unequal grams). */
  private def sortedPositions(toks: Array[String], n: Int): Array[Integer] = {
    val p = toks.length - n + 1
    val hash = new Array[Int](p)
    var q = 0
    while (q < p) {
      var h = 17
      var j = 0
      while (j < n) { h = h * 31 + toks(q + j).hashCode; j += 1 }
      hash(q) = h
      q += 1
    }
    val idx = Array.range(0, p).map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c0 = java.lang.Integer.compare(hash(a), hash(b))
        if (c0 != 0) return c0
        var j = 0
        while (j < n) {
          val c = toks(a + j).compareTo(toks(b + j))
          if (c != 0) return c
          j += 1
        }
        0
      }
    })
    idx
  }

  private def gramEq(toks: Array[String], a: Int, b: Int, n: Int): Boolean = {
    var j = 0
    while (j < n) {
      if (toks(a + j) != toks(b + j)) return false
      j += 1
    }
    true
  }

  private def topMass(toks: Array[String], charPrefix: Array[Long], n: Int): Long = {
    val m = toks.length
    if (m < n) return 0L
    val sorted = sortedPositions(toks, n)
    def gramChars(pos: Int): Long = charPrefix(pos + n) - charPrefix(pos)
    var best = 0L
    var run = 1L
    var k = 1
    while (k < sorted.length) {
      run = if (gramEq(toks, sorted(k - 1), sorted(k), n)) run + 1 else 1L
      if (run >= 2L) {
        val mass = run * gramChars(sorted(k))
        if (mass > best) best = mass
      }
      k += 1
    }
    best
  }

  private def dupMass(toks: Array[String], charPrefix: Array[Long], n: Int): Long = {
    val m = toks.length
    if (m < n) return 0L
    val sorted = sortedPositions(toks, n)
    val isDup = new Array[Boolean](sorted.length)
    var k = 1
    while (k < sorted.length) {
      if (gramEq(toks, sorted(k - 1), sorted(k), n)) {
        isDup(sorted(k - 1)) = true
        isDup(sorted(k)) = true
      }
      k += 1
    }
    // union of [p, p+n-1] spans over dup positions, ascending: a
    // cursor marks the first token not yet counted.
    var mass = 0L
    var next = 0
    var p = 0
    while (p < isDup.length) {
      if (isDup(p)) {
        val from = math.max(p, next)
        val to = p + n // exclusive
        if (to > from) mass += charPrefix(to) - charPrefix(from)
        next = math.max(next, to)
      }
      p += 1
    }
    mass
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 63-bit token-vote SimHash — one JVM pass per row: one sha256
  * per token, a primitive 63-bit vote loop, one final assembly.
  * Replaces the interpreted HOF pipeline of
  * [[TextFunctions.simhash63Sql]] (per token: a let1 array binding, a
  * 63-element transform allocating structs, a zip_with allocating the
  * vote array again — measured ~8.7 s for the sf0.1 document corpus
  * where this kernel does the same work in the sha-bound floor).
  * MUST stay value-identical to the HOF form (parity asserted in
  * TextFunctionsSpec; the DuckDB oracle replicates the HOF form):
  * - tokens = split on single space, trailing empties kept (the
  *   [[ShinglesExpr]] contract) — empty tokens vote like any other;
  * - vote j += (hash60(token) >> j) & 1 == 1 ? +1 : -1, j in 0..62;
  * - bit j of the result set when vote j > 0 (bits 60-62 always lose
  *   — hash60 never sets them — and stay 0 in both forms).
  * CodegenFallback: sha256 dominates, like the MinHash kernel.
  */
case class Simhash63Expr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash63"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](63)
    var i = 0
    while (i < toks.length) {
      val h = HashFunctions.hash60Parts(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 63) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 63) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused token statistics for the Gopher quality gate — one JVM pass
  * per row over the whitespace tokens: token count, distinct count,
  * max token multiplicity, raw-bigram count and duplicated-bigram
  * count. Replaces the interpreted HOF pipeline inside
  * QualitySignals.tokenSignals (an array_sort + O(m) aggregate fold
  * allocating a struct PER TOKEN for the top-frequency run, plus a
  * transform + array_distinct pass for bigram dups — HOF lambdas never
  * enter whole-stage codegen).
  *
  * SAFE-FUSION PATTERN (same as [[NgramRepetitionExpr]]): the kernel
  * emits exact INTEGER counts only; every ratio and its 4-dp rounding
  * stays in Column space, built from these counts with the identical
  * round()/division calls — so value identity with the HOF form (and
  * the DuckDB oracles that replicate it) holds by construction for
  * the derived fractions, and the parity spec pins the counts.
  *
  * Count semantics (must match the HOF form exactly):
  * - tokens = split on single space, trailing empties kept;
  * - top_freq = max multiplicity of any token == the HOF's max
  *   equal-run length over array_sort(tokens) (equal tokens sort
  *   adjacent); 1 when there are fewer than 2 tokens;
  * - n_bigrams = max(n_tokens - 1, 0) ("a b"-joined raw bigrams);
  * - n_dup_bigrams = n_bigrams - distinct bigrams (0 when none).
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_freq", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_bigrams", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_dup_bigrams", LongType, nullable = false)))
  override def prettyName: String = "graft_token_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    val freq = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    var topFreq = 0L
    while (i < n) {
      val f = freq.merge(toks(i), 1L, (a, b) => a + b)
      if (f > topFreq) topFreq = f
      i += 1
    }
    // HOF parity: the run fold hard-codes 1 for fewer than 2 tokens
    // (sz >= 2 gate); with >= 1 token max multiplicity is >= 1 anyway,
    // so only the impossible n == 0 case differs — split never
    // produces an empty array, but keep the floor explicit.
    if (topFreq < 1L) topFreq = 1L
    val nBigrams = math.max(n - 1, 0)
    var nDup = 0L
    if (nBigrams > 0) {
      val seen = new java.util.HashSet[String](nBigrams * 2)
      i = 0
      while (i < nBigrams) {
        if (!seen.add(toks(i) + " " + toks(i + 1))) nDup += 1L
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n.toLong, freq.size.toLong, topFreq, nBigrams.toLong, nDup)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused surface text statistics — one JVM pass per row over the
  * whitespace tokens: token count, summed token char length (code
  * points, matching Spark length()), BPE-ish subword estimate, and one
  * stopword hit count per supplied word list. Replaces the ~9
  * interpreted HOF passes TextAnalysis.analyze paid per row
  * (bpeTokenEstimateOf + stopwordRatioOf + meanTokenLenOf, each
  * re-run inside qualityScoreOf, plus langGuessOf's four wordRatioOf
  * filters — HOF lambdas never enter whole-stage codegen).
  *
  * SAFE-FUSION PATTERN ([[NgramRepetitionExpr]] / [[TokenStatsExpr]]):
  * integer counts only; ratios, rounding, score formulas and the
  * language-id fold stay in Column space built from these counts, so
  * the derived values equal the HOF forms by construction (kernel
  * counts parity-pinned in TextFunctionsSpec; the q_text_analysis
  * oracle replays the HOF arithmetic externally).
  *
  * Count semantics (must match the HOF forms exactly):
  * - tokens = split on single space, trailing empties kept;
  * - sum_token_chars = Σ code-point length per token (Spark length());
  *   summed as long — the HOF's double fold of integers is exact
  *   below 2^53, so long-sum == double-fold bit-for-bit after cast;
  * - bpe_est = Σ ceil(len/4) = Σ (len + 3) / 4 in integers;
  * - hits[i] = tokens contained in wordLists(i) (the isin filter).
  */
case class TextStatsExpr(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_token_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("bpe_est", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("hits",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    wordLists.map { ws =>
      val s = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(s.add)
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val k = sets.length
    val hits = new Array[Long](k)
    var sumChars = 0L
    var bpe = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val len = t.codePointCount(0, t.length)
      sumChars += len
      bpe += (len + 3) / 4
      var j = 0
      while (j < k) {
        if (sets(j).contains(t)) hits(j) += 1L
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, sumChars, bpe,
      new GenericArrayData(hits.map(v => v: Any)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused token-window chunking — one JVM pass per row building every
  * chunk string directly. Replaces the interpreted HOF construction of
  * [[TextFunctions.chunksSql]] (a transform over sequence() whose body
  * runs slice + concat_ws per chunk over the re-read token array; HOF
  * lambdas never enter codegen) on the store-build hot path (chunk ->
  * embed per chunk, q_maxsim_build's documented floor) and the
  * chunk/pack queries. MUST stay value-identical to the HOF form
  * (parity asserted in TextFunctionsSpec; the q_chunk DuckDB oracle
  * replicates the HOF arithmetic):
  * - tokens = split on single space, trailing empties kept;
  * - stride = chunkSize - overlap; n <= chunkSize -> exactly 1 chunk;
  *   else floor((n - chunkSize + stride - 1) / stride) + 1 chunks;
  * - chunk i = tokens[i*stride, i*stride + chunkSize) joined by one
  *   space, the last window clamped (shorter tail kept, never padded).
  */
case class ChunksExpr(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftSqlBridge.StringUnaryInputs {
  require(chunkSize > 0, "chunkSize must be positive")
  require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    val stride = chunkSize - overlap
    val nChunks =
      if (n <= chunkSize) 1
      else (n - chunkSize + stride - 1) / stride + 1
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      val start = c * stride
      val end = math.min(start + chunkSize, n)
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
