package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization of a string column (JDK
  * `java.text.Normalizer`), as a codegen'd expression — the
  * canonical-equivalence step in front of content hashing: a precomposed
  * "é" (U+00E9) and "e" + combining acute (U+0301) are the same text to
  * a dedup pipeline, but different bytes to md5. Real multilingual
  * corpora mix normalization forms (different OS keyboards, OCR,
  * editors), so exact dedup without canonicalization silently
  * under-merges.
  *
  * Fast path: `Normalizer.isNormalized` on already-NFC input (the
  * overwhelmingly common case, and ALL ASCII) avoids the allocation —
  * the input UTF8String is returned as-is. Oracle mirror: DuckDB's
  * `nfc_normalize`. Null in → null out (UnaryExpression default).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
