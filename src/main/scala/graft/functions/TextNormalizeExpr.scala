package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a codegen'd scalar — Spark ships no
  * normalization built-in, and a crawl corpus mixes precomposed and
  * combining-mark encodings of the same visible text ("café" two ways),
  * which defeats every byte-keyed stage downstream (exact dedup,
  * fingerprints, shingles, URL keys). NFC (canonical composition) is
  * the C4/CCNet choice: visually-identical text gets identical bytes
  * while compatibility characters (ligatures, full-width forms) are
  * left alone.
  *
  * Fast path: the quick-check for already-NFC input (the overwhelming
  * majority of real text, and ALL pure-ASCII) returns the input
  * UTF8String untouched — no String materialization beyond the check.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
