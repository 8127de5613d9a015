package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Greedy maximum-coverage selection (the classic (1−1/e) greedy for
  * facility location / MaxCover) over document shingle sets — the
  * diversity-selection move in training-data curation: pick the k
  * documents that together cover the most distinct n-grams, each step
  * choosing the document with the largest MARGINAL gain over what the
  * picks so far already cover.
  *
  * Execution follows the audited BPE-learner loop discipline
  * ([[graft.text.Bpe]]): the corpus pays ONE shingle pass; each of
  * the k rounds is a distributed anti-join + aggregate whose argmax —
  * ONE row — comes to the driver (ties broken (gain DESC, doc_id
  * ASC), so the trajectory is deterministic); the covered-gram set
  * accumulates through checkpoint-released materializations, never
  * driver memory. Shingles travel as 64-bit
  * [[graft.dedup.Dedup.wordNgramHashesRaw]] hashes; gains depend only
  * on gram EQUALITY, so the string-aggregating oracle (an unrolled
  * k-step greedy in nested CTEs) hash-matches under the same
  * collision-tolerance argument as the dedup family.
  *
  * Scale: per round, the exchanges are the gram-keyed anti-join
  * against the covered set and the doc-keyed count — both on the
  * distinct-shingle relation, not the corpus; k is small by
  * construction (a selection budget), exactly the BPE merge-count
  * shape.
  */
object MaxCover {

  val K = 5
  val N = 3 // word n-gram order

  /** Greedy pick trajectory: (step 1..≤k, doc_id, gain). Stops early
    * if no document adds coverage.
    */
  def select(docs: DataFrame, k: Int = K): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (g, releaseG) = graft.Checkpoints.localEager(
      graft.dedup.Dedup.wordNgramHashesRaw(docs, N).distinct())
    val picks = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var covered: Option[DataFrame] = None
    var freeCov: () => Unit = () => ()
    var step = 1L
    var done = false
    while (!done && step <= k) {
      val pickedDocs = picks.map(_._2)
      val remaining =
        if (pickedDocs.isEmpty) g
        else g.where(!col("doc_id").isInCollection(pickedDocs))
      val uncovered = covered match {
        case None => remaining
        case Some(c) => remaining.join(c, Seq("gh"), "left_anti")
      }
      val top = uncovered.groupBy("doc_id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val doc = top(0).getLong(0); val gain = top(0).getLong(1)
        picks += ((step, doc, gain))
        val newCov = covered match {
          case None => g.where(col("doc_id") === doc).select("gh")
          case Some(c) => c.union(g.where(col("doc_id") === doc).select("gh")).distinct()
        }
        val (pinned, freeNext) = graft.Checkpoints.localEager(newCov)
        freeCov()
        freeCov = freeNext
        covered = Some(pinned)
        step += 1
      }
    }
    freeCov(); releaseG()
    picks.toSeq.toDF("step", "doc_id", "gain")
  }

  /** Doc-local gain probes the most recent [[selectLazy]] issued —
    * diagnostics for `MaxCoverSpec`'s laziness assertion (each probe is
    * one doc's shingle set anti-joined against the covered set, never a
    * corpus-scale aggregate).
    */
  @volatile var lastLazyProbes: Int = -1

  /** Full bound-refreshes the most recent [[selectLazy]] escalated to —
    * each one is exactly one [[select]]-style corpus round.
    */
  @volatile var lastLazyRefreshes: Int = -1

  /** CELF lazy-greedy twin of [[select]] (Leskovec et al. 2007,
    * "Cost-effective Outbreak Detection"): submodularity makes every
    * round-r marginal gain an UPPER BOUND on the same document's
    * round-(r+1) gain, so stale gains from earlier rounds are valid
    * priorities. Only round 1 pays a corpus-scale aggregate (exact
    * initial gains = per-doc distinct shingle counts); later picks pop
    * the max-bound candidates and fresh-evaluate only them, accepting
    * a candidate exactly when its EXACT gain tops every remaining
    * bound under the (gain DESC, doc_id ASC) order — bounds only
    * overestimate, so the accepted doc is the true argmax and the
    * trajectory is provably identical to [[select]]'s.
    *
    * Two shapes bound the cost on overlap-heavy corpora (the r14
    * probe lesson: one-candidate-per-job CELF degenerated to 63s at
    * 30× while FIVE eager rounds cost 7s — per-candidate probes pay a
    * full scan of the shingle relation each, so a deep stale cascade
    * after a pick turns the "lazy" path into hundreds of scans):
    *  - probes are BATCHED: the top `ProbeBatch` stale candidates
    *    fresh-evaluate in ONE anti-join + doc-keyed aggregate job
    *    (already-fresh candidates from this pick's earlier batches are
    *    never re-evaluated — their override IS exact for the current
    *    covered set, so a fresh candidate reaching the top of the
    *    bounds order is accepted without re-probing);
    *  - a pick that stays unaccepted past `RefreshLimit` popped
    *    candidates ESCALATES to one full bound refresh — exactly one
    *    eager round recomputing every remaining doc's exact gain into
    *    a new checkpointed base — capping any pick's worst case at the
    *    eager algorithm's per-round cost.
    *
    * Driver state stays bounded: batch gains (≤ ProbeBatch rows),
    * stale-bound overrides folded into a fresh executor-held
    * checkpoint past a small cap, and the picks list.
    */
  def selectLazy(docs: DataFrame, k: Int = K): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (g, releaseG) = graft.Checkpoints.localEager(
      graft.dedup.Dedup.wordNgramHashesRaw(docs, N).distinct())
    // Round-1 bounds are EXACT gains (nothing covered yet).
    var (base, freeBase) = graft.Checkpoints.localEager(
      g.groupBy("doc_id").agg(count(lit(1)).as("ub")))
    // Driver-side deltas on the checkpointed base: picked/rejected docs'
    // fresh bounds. Folded back into a new checkpoint past FoldCap so
    // the rebuilt plan never grows unboundedly.
    val FoldCap = 64
    val ProbeBatch = 8
    val RefreshLimit = 24
    var overrides = Map.empty[Long, Long]
    var removed = Set.empty[Long]
    var picked = Set.empty[Long]
    // true ⇔ every current bounds entry equals its true marginal gain
    // for the CURRENT covered set (initially, and after a refresh)
    var boundsExact = true
    def bounds: DataFrame = {
      val keep = base.where(
        if (removed.isEmpty && overrides.isEmpty) lit(true)
        else !col("doc_id").isInCollection(removed ++ overrides.keySet))
      if (overrides.isEmpty) keep
      else keep.union(overrides.toSeq.toDF("doc_id", "ub"))
    }
    def foldIfDeep(): Unit =
      if (overrides.size + removed.size > FoldCap) {
        val (next, freeNext) = graft.Checkpoints.localEager(bounds)
        freeBase(); freeBase = freeNext; base = next
        overrides = Map.empty; removed = Set.empty
      }
    val picks = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var covered: Option[DataFrame] = None
    var freeCov: () => Unit = () => ()
    var probes = 0
    var refreshes = 0
    var step = 1L
    var done = false
    def accept(d: Long, gain: Long): Unit = {
      picks += ((step, d, gain))
      val newCov = covered match {
        case None => g.where(col("doc_id") === d).select("gh")
        case Some(c) =>
          c.union(g.where(col("doc_id") === d).select("gh")).distinct()
      }
      val (pinned, freeNext) = graft.Checkpoints.localEager(newCov)
      freeCov(); freeCov = freeNext
      covered = Some(pinned)
      picked += d; removed += d; overrides -= d
      boundsExact = false
      step += 1
    }
    def fullRefresh(): Unit = {
      refreshes += 1
      val c = covered.get // never escalates before the first pick
      val exact = g.where(!col("doc_id").isInCollection(picked))
        .join(c, Seq("gh"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("ub"))
      val (next, freeNext) = graft.Checkpoints.localEager(exact)
      freeBase(); freeBase = freeNext; base = next
      overrides = Map.empty; removed = Set.empty
      boundsExact = true
    }
    while (!done && step <= k) {
      var freshThisPick = Set.empty[Long]
      var poppedTotal = 0
      var accepted = false
      while (!accepted && !done) {
        val top = bounds.orderBy(col("ub").desc, col("doc_id")).limit(ProbeBatch + 1).collect()
        if (top.isEmpty || top(0).getLong(1) <= 0L)
          done = true // all true gains are 0 — greedy stops, like select
        else if (boundsExact || freshThisPick(top(0).getLong(0))) {
          // the top bound is an exact gain and bounds only overestimate
          // — (ub DESC, doc_id ASC) pop order IS the greedy tie rule
          accept(top(0).getLong(0), top(0).getLong(1))
          accepted = true
        } else {
          val toEval = top.take(ProbeBatch)
            .map(r => (r.getLong(0), r.getLong(1)))
            .filter { case (id, ub) => ub > 0 && !freshThisPick(id) }
            .map(_._1).toSeq
          poppedTotal += toEval.size
          if (poppedTotal > RefreshLimit) fullRefresh()
          else {
            probes += toEval.size
            val gains = g.where(col("doc_id").isInCollection(toEval))
              .join(covered.get, Seq("gh"), "left_anti")
              .groupBy("doc_id").agg(count(lit(1)).as("fresh"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            toEval.foreach(id => overrides += (id -> gains.getOrElse(id, 0L)))
            freshThisPick ++= toEval
            foldIfDeep()
          }
        }
      }
    }
    freeCov(); freeBase(); releaseG()
    lastLazyProbes = probes
    lastLazyRefreshes = refreshes
    picks.toSeq.toDF("step", "doc_id", "gain")
  }

  /** Unrolled k-step greedy in nested CTEs over the gram STRINGS —
    * structurally independent of the hash-carrying engine loop.
    */
  private def duckGreedySql(k: Int): String = {
    val ctes = scala.collection.mutable.ListBuffer(
      s"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         |g AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram
         |      FROM toks, unnest(generate_series(1, len(t) - ${N - 1})) s(i)
         |      WHERE len(t) >= $N)""".stripMargin)
    for (s <- 1 to k) {
      val notDoc =
        if (s == 1) ""
        else "WHERE doc_id NOT IN (" +
          (1 until s).map(j => s"SELECT doc_id FROM pick$j").mkString(" UNION ALL ") + ")"
      val notGram =
        if (s == 1) ""
        else s"${if (notDoc.isEmpty) "WHERE" else "AND"} gram NOT IN (SELECT gram FROM cov${s - 1})"
      ctes += s"gain$s AS (SELECT doc_id, count(*) AS c FROM g $notDoc $notGram GROUP BY 1)"
      ctes += s"pick$s AS (SELECT doc_id, c FROM gain$s ORDER BY c DESC, doc_id LIMIT 1)"
      val prev = if (s == 1) "" else s"SELECT gram FROM cov${s - 1} UNION "
      ctes += s"cov$s AS (${prev}SELECT DISTINCT gram FROM g WHERE doc_id IN (SELECT doc_id FROM pick$s))"
    }
    "WITH " + ctes.mkString(",\n") + "\n" +
      (1 to k).map(s =>
        s"SELECT CAST($s AS BIGINT) AS step, doc_id, CAST(c AS BIGINT) AS gain FROM pick$s")
        .mkString(" UNION ALL ") +
      " ORDER BY step"
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "maxcover_select",
      (s, dir) => select(Tables.documents(s, dir)).orderBy("step"),
      Some(duckGreedySql(K)),
    ),
    // The CELF twin must land on the IDENTICAL trajectory — same oracle.
    EngineQuery(
      "maxcover_select_lazy",
      (s, dir) => selectLazy(Tables.documents(s, dir)).orderBy("step"),
      Some(duckGreedySql(K)),
      headline = true,
    ),
  )
}
