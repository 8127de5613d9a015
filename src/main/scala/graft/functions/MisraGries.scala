package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed `Aggregator`: a bounded
  * map of at most `k` counters. Guarantee (Misra & Gries 1982): any item
  * whose true frequency exceeds n/(k+1) is present in the final summary,
  * for ANY arrival order — which makes it safe to merge per-partition
  * summaries (Agarwal et al. 2013 mergeable-summaries construction:
  * sum the counter maps, then subtract the (k+1)-largest count and drop
  * non-positive counters).
  *
  * The summary's counts are only lower bounds, and WHICH non-heavy items
  * survive depends on partitioning — so the engine never exposes raw MG
  * output to the gate. [[graft.text.HeavyHitters]] uses it as pass 1 of
  * the standard exact two-pass: MG candidates (tiny, broadcastable),
  * then an exact recount of candidates only. The final relation —
  * all items with count > n/(k+1), with exact counts — is deterministic
  * and partitioning-independent, which is what the oracle checks.
  */
class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all step; drop counters reaching zero
        b.flatMap { case (w, c) => if (c > 1L) Some(w -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  // Native SQL-typed encoders: the buffer travels partial->final as a real
  // MapType (no per-row kryo in merge), and the output is a real
  // ArrayType(StringType) column — required so callers can `explode` it
  // (a kryo output encoder would surface as an un-explodable binary blob).
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
