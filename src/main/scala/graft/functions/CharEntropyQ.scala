package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character-entropy lane: `char_entropy_q(text)` →
  * struct(n BIGINT, nd BIGINT, hq BIGINT) where n = code-point count,
  * nd = distinct code points, hq = n·qlog2(n) − Σ c·qlog2(c) on the
  * [[graft.text.Unigram]] fixed-point base-2 log.
  *
  * Replaces the higher-order-function formulation (sorted-run fold
  * over `transform(sequence(..), i -> substring(text, i, 1))`):
  * Spark HOF lambdas evaluate through the interpreter per ELEMENT and
  * allocate a UTF8String per character, which made the entropy sweep
  * ~5µs/char; this compiles to one static call per row doing a tight
  * code-point histogram loop (~ns/char), the [[DotI64]] discipline.
  */
case class CharEntropyQ(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"char_entropy_q needs a string, got $t")
    }

  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("nd", LongType, nullable = false)
    .add("hq", LongType, nullable = false)

  override def prettyName: String = "char_entropy_q"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyQ.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyQ.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyQ =
    copy(child = newChild)
}

object CharEntropyQ {

  /** One pass over the code points; alphabet-bounded histogram. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, _ + _)
      n += 1L
    }
    var hq = 0L
    if (n > 0) {
      var sum = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        sum += c * graft.text.Unigram.qlog2Ref(c)
      }
      hq = n * graft.text.Unigram.qlog2Ref(n) - sum
    }
    new GenericInternalRow(Array[Any](n, counts.size().toLong, hq))
  }
}
