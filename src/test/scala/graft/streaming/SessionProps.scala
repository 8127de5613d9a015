package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for the pure sessionization fold shared by the batch
  * and streaming wrappers: against a naive reference model, on random
  * event streams, including the carry-over path (events split across
  * two fold calls must produce the same sessions as one call).
  */
object SessionProps extends Properties("StatefulSessions.foldSessions") {
  import StatefulSessions._

  private val gap = 100L
  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(0, 40)
    ts <- Gen.listOfN(n, Gen.chooseNum(0L, 2000L))
  } yield ts.zipWithIndex.map { case (t, i) => Ev(1L, t, i.toLong) }
    .sortBy(e => (e.tms, e.event_id))

  private def naive(evs: List[Ev]): List[(Long, Long, Long)] =
    if (evs.isEmpty) Nil
    else {
      // split sorted events where the inter-event gap exceeds `gap`
      val groups = evs.tail.foldLeft(List(List(evs.head))) { (acc, e) =>
        if (e.tms - acc.head.head.tms <= gap) (e :: acc.head) :: acc.tail
        else List(e) :: acc
      }
      groups.reverse.map(g => (g.length.toLong, g.last.tms, g.head.tms))
    }

  property("matches naive gap-splitting model") = forAll(genEvents) { evs =>
    val (closed, open) = foldSessions(evs, gap, None)
    val all = (closed ++ open).map(s => (s.n_events, s.start_ms, s.last_ms))
    all == naive(evs) &&
      all.zipWithIndex.forall { case (_, i) => (closed ++ open)(i).session_id == i + 1 }
  }

  property("splitting the stream across two calls preserves sessions") =
    forAll(genEvents, Gen.chooseNum(0, 40)) { (evs, cut) =>
      val (a, b) = evs.splitAt(cut.min(evs.length))
      val (c1, o1) = foldSessions(a, gap, None)
      val (c2, o2) = foldSessions(b, gap, o1)
      val twoCall = (c1 ++ c2 ++ o2).map(s => (s.session_id, s.n_events, s.start_ms, s.last_ms))
      val (c, o) = foldSessions(evs, gap, None)
      val oneCall = (c ++ o).map(s => (s.session_id, s.n_events, s.start_ms, s.last_ms))
      twoCall == oneCall
    }
}
