package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
