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

  /** CELF lazy-greedy twin of [[select]] (Leskovec et al. 2007,
    * "Cost-effective Outbreak Detection"): submodularity makes every
    * round-r marginal gain an UPPER BOUND on the same document's
    * round-(r+1) gain, so stale gains from earlier rounds are valid
    * priorities. Only round 1 pays a corpus-scale aggregate (exact
    * initial gains = per-doc distinct shingle counts); every later step
    * pops the max-bound candidate (a distributed TakeOrdered over the
    * doc-scale bounds relation) and FRESH-evaluates just that one
    * document — an anti-join of ITS shingle set against the covered
    * set, |shingles(doc)|-bounded work — accepting when the fresh gain
    * still beats the runner-up's bound under the (gain DESC, doc_id
    * ASC) order. The trajectory is provably identical to [[select]]'s;
    * the selection budget k no longer multiplies corpus-scale rounds
    * (the r13 verdict watch item).
    *
    * Driver state per probe is ≤ 2 rows (the popped candidate and the
    * runner-up bound); stale-bound overrides accumulate driver-side and
    * fold into a fresh executor-held checkpoint once they exceed a
    * small cap, so the bounds relation's plan stays O(cap) deep while
    * the relation itself never leaves the executors.
    */
  def selectLazy(docs: DataFrame, k: Int = K): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (g, releaseG) = graft.Checkpoints.localEager(
      graft.dedup.Dedup.wordNgramHashesRaw(docs, N).distinct())
    // Round-1 bounds are EXACT gains (nothing covered yet) — the only
    // corpus-scale aggregate of the whole selection.
    var (base, freeBase) = graft.Checkpoints.localEager(
      g.groupBy("doc_id").agg(count(lit(1)).as("ub")))
    // Driver-side deltas on the checkpointed base: picked/rejected docs'
    // fresh bounds. Folded back into a new checkpoint past FoldCap so
    // the rebuilt plan never grows unboundedly.
    val FoldCap = 64
    var overrides = Map.empty[Long, Long]
    var removed = Set.empty[Long]
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
    var step = 1L
    var done = false
    while (!done && step <= k) {
      var accepted = false
      while (!accepted && !done) {
        val top2 = bounds.orderBy(col("ub").desc, col("doc_id")).limit(2).collect()
        if (top2.isEmpty || top2(0).getLong(1) <= 0L)
          done = true // all true gains are 0 — greedy stops, like select
        else {
          val d = top2(0).getLong(0)
          val ub = top2(0).getLong(1)
          val fresh: Long = covered match {
            case None => ub // bounds are exact until the first pick
            case Some(c) =>
              probes += 1
              g.where(col("doc_id") === d).join(c, Seq("gh"), "left_anti").count()
          }
          // Accept iff d still wins (gain DESC, doc_id ASC) against the
          // runner-up's bound: the bound only overestimates, and doc_id
          // ties fall to d exactly when d is the smaller id.
          val runnerBeats = top2.length > 1 && {
            val nd = top2(1).getLong(0); val nub = top2(1).getLong(1)
            nub > fresh || (nub == fresh && nd < d)
          }
          if (fresh > 0 && !runnerBeats) {
            picks += ((step, d, fresh))
            val newCov = covered match {
              case None => g.where(col("doc_id") === d).select("gh")
              case Some(c) =>
                c.union(g.where(col("doc_id") === d).select("gh")).distinct()
            }
            val (pinned, freeNext) = graft.Checkpoints.localEager(newCov)
            freeCov(); freeCov = freeNext
            covered = Some(pinned)
            removed += d; overrides -= d
            step += 1
            accepted = true
          } else {
            overrides += (d -> fresh) // stale bound refreshed; re-pop
          }
          foldIfDeep()
        }
      }
    }
    freeCov(); freeBase(); releaseG()
    lastLazyProbes = probes
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
