package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state per-group top-k: keep the k best (score DESC, id ASC)
  * pairs in a size-k binary heap whose ROOT is the worst kept element
  * (so a beats-the-root insert is O(log k) and everything else is a
  * single comparison).
  *
  * This is the 100 TB shape for "top N per group": the window-rank
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY s DESC)
  * <= k`) must SORT every group's full row set; this aggregate's
  * state never exceeds k pairs per group per partition, partial heaps
  * map-side combine, and the exchange carries ≤ k·partitions rows per
  * group instead of the group's corpus. Total order (score DESC, id
  * ASC) makes the result deterministic under any partitioning and
  * tie-heavy data.
  */
final class TopKHeap(val k: Int) {
  // parallel arrays, heap-ordered by "worst at root"
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a strictly better than b under (score DESC, id ASC)? */
  @inline private def better(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  def insert(s: Long, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than child
      while (i > 0) {
        val p = (i - 1) >> 1
        if (better(scores(p), ids(p), scores(i), ids(i))) {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(i); ids(p) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = p
        } else i = 0
      }
    } else if (better(s, id, scores(0), ids(0))) {
      scores(0) = s; ids(0) = id
      // sift down: push the new root toward the leaves past any child
      // that is WORSE than it (root must be the overall worst)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // index of worst among i and children
        if (l < size && better(scores(w), ids(w), scores(l), ids(l))) w = l
        if (r < size && better(scores(w), ids(w), scores(r), ids(r))) w = r
        if (w == i) done = true
        else {
          val ts = scores(w); val ti = ids(w)
          scores(w) = scores(i); ids(w) = ids(i)
          scores(i) = ts; ids(i) = ti
          i = w
        }
      }
    }
  }

  /** Kept pairs sorted best-first. */
  def sortedPairs: Array[(Long, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** `topk_pairs(score BIGINT, id BIGINT, k)` →
  * ARRAY<STRUCT<score BIGINT, id BIGINT>> of the k best, best-first.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType()
      .add("score", LongType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    // Pattern-match the folded k against Number BEFORE intValue(): a
    // non-numeric foldable k (e.g. topk_pairs(s, id, 'x')) must fail
    // analysis with this TypeCheckFailure, not a ClassCastException.
    (score.dataType, id.dataType, if (kExpr.foldable) kExpr.eval(null) else null) match {
      case (LongType, LongType, n: Number)
          if n.intValue() >= 1 && n.intValue() <= (1 << 20) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "topk_pairs needs (BIGINT score, BIGINT id, foldable integral k in [1, 2^20])")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_pairs"
}
