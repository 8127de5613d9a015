package graft.kmer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst Generator emitting all width-k windows of a string — the
  * direct analog of the reference's Map kernel (one work-item per
  * character position, reference `src/GPU_Module/GPU.cpp:32-45`),
  * without materializing the O(len) position array that the
  * `explode(sequence(...))` formulation allocates per row.
  *
  * Trade-off, measured in [[KmerBench]] (sf0.1, local[32], kmer count
  * end-to-end): explode(sequence) runs inside WholeStageCodegen and
  * wins at small k (k=3: 0.68s vs 0.84s; k=8: 0.80s vs 1.59s); this
  * generator evaluates interpreted (Generator codegen is only wired
  * for CollectionGenerator, whose ArrayData contract would reintroduce
  * the per-row materialization) but avoids the O(len) position-array
  * allocation and wins at large k (k=21: 0.86s vs 1.54s). Both paths
  * stay available; [[Kmers.kmerCounts]] keeps the codegen explode as
  * default since the gate queries use k=3.
  */
case class KmerGenerator(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("word", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType if k >= 1 && k <= Kmers.MaxK => TypeCheckResult.TypeCheckSuccess
      case _: StringType => TypeCheckResult.TypeCheckFailure(s"k must be in [1, ${Kmers.MaxK}], got $k")
      case other => TypeCheckResult.TypeCheckFailure(s"kmer_windows needs a string column, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val n = s.numChars()
      if (n < k) Iterator.empty
      else new Iterator[InternalRow] {
        private[this] var i = 0
        private[this] val last = n - k
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          val w = s.substring(i, i + k)
          i += 1
          new GenericInternalRow(Array[Any](w))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): KmerGenerator =
    copy(child = newChild)
}
