package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}
import graft.functions.MisraGriesAgg

/** Guaranteed heavy hitters over the corpus token stream — the exact
  * two-pass pattern that scales where a full `GROUP BY term` would not:
  *
  *  pass 1: a Misra–Gries bounded summary ([[MisraGriesAgg]], k
  *          counters) runs as one partial+final aggregation; by the MG
  *          guarantee the summary is a SUPERSET of every item with
  *          frequency > n/(k+1). The summary is at most k items — it
  *          broadcasts no matter how large the corpus is.
  *  pass 2: exact recount restricted to the candidates (map-side
  *          broadcast semi-join, so the token stream shuffles only the
  *          candidate subset), then the exact threshold
  *          count > n/(k+1) drops MG's false positives.
  *
  * The output — every token with true frequency > n/(k+1), with its
  * exact count — is deterministic and partitioning-independent even
  * though MG's internal summary is not, so it gates against a plain
  * GROUP BY/HAVING oracle. At 100 TB: the full-vocab GROUP BY this
  * replaces shuffles billions of distinct keys; here the only wide
  * shuffle carries tokens that survive a ≤k-item broadcast filter.
  */
object HeavyHitters {

  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k))
    val toks = graft.Partitioning.fanOut(docs)
      .select(explode(TextAnalysis.wsTokens(lower(col("text")))).as("term"))
      .where(col("term") =!= "")
    // Pass 1: one aggregation yields BOTH the MG candidate set and the
    // exact stream length — a single scan of the corpus. Exploding the
    // one-row summary gives <= k (term, n_total) rows, broadcast below.
    val candidates = toks
      .agg(mg(col("term")).as("cands"), count(lit(1)).as("n_total"))
      .select(explode(col("cands")).as("term"), col("n_total"))
    // Pass 2: exact recount restricted to candidates. The inner broadcast
    // join doubles as the semi-filter and carries n_total to every
    // surviving row, so no third scan and no separate cross join.
    toks.join(broadcast(candidates), Seq("term"))
      .groupBy("term", "n_total")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > col("n_total"))
      .select(col("term"), col("cnt"), col("n_total"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "heavy_hitters",
      (s, dir) => heavyHitters(Tables.documents(s, dir), k = 49).orderBy("term"),
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
             |  FROM documents WHERE length(trim(text)) > 0),
             |t AS (SELECT term FROM toks WHERE term <> ''),
             |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
             |n AS (SELECT count(*) AS n_total FROM t)
             |SELECT term, cnt, n_total FROM c CROSS JOIN n
             |WHERE cnt * 50 > n_total ORDER BY term""".stripMargin),
      headline = true,
    ),
  )
}
