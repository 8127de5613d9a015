package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization of a string column — the text
  * canonicalization step every multilingual corpus needs before exact
  * or near dedup (the same visible text arrives both composed `é` and
  * decomposed `e`+U+0301; unnormalized, their hashes/shingles differ
  * and duplicates slip through).
  *
  * Spark SQL ships no normalization function, so this is the engine's
  * second custom scalar expression (after [[DotI64]]): `doGenCode`
  * emits a direct static call to `java.text.Normalizer` inside the
  * WholeStageCodegen body — no UDF wrapper, no serialization, and two
  * fast paths that return the input UTF8String untouched: pure-ASCII
  * text (numBytes == numChars — always NFC, checked without decoding
  * the bytes at all) and already-normalized non-ASCII text
  * (`Normalizer.isNormalized` over one decoded String, no second
  * allocation).
  *
  * DuckDB's `nfc_normalize` implements the identical transform, so
  * results are gate-checkable value-for-value.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // ASCII is always NFC: one byte per char means no combining marks,
    // no decode, no allocation — the dominant case costs a length check.
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
