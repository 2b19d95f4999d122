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
    extends UnaryExpression with CodegenFallback {
  require(n > 0, "shingle size must be positive")

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
    extends UnaryExpression with CodegenFallback {
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
    extends UnaryExpression with CodegenFallback {
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
