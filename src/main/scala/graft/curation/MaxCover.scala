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
  )
}
