package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. The driver's correctness
  * gate diffs the two (SURVEY.md §5); queries without an oracle get a
  * weaker rows-only check.
  *
  * Portability rules every query follows (so Spark parquet output
  * hash-matches DuckDB):
  *  - integer outputs are BIGINT in both engines (Spark `length`/`size`
  *    return INT, DuckDB's return BIGINT — always cast);
  *  - every query ends in a total ORDER BY (all columns, or a unique key);
  *  - doubles are either raw column passthroughs or results of exact
  *    integer/decimal arithmetic cast to double at the end — never
  *    order-dependent float accumulation;
  *  - timestamps are surfaced as BIGINT epoch seconds;
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all semantics.
  */
final case class EngineQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    /** Untimed preparation for queries whose measured half should exclude
      * one-time work — the `*_from_saved` train+persist half (r16
      * verdict item 4: a from-saved headline that re-trains before
      * applying conflates train and apply cost). The correctness gate
      * composes setup+fn (SparkEntry.queries), so the gate still proves
      * the full train→save→load→apply loop; Bench/ScaleProbe run setup
      * OUTSIDE the timed window so the measurement is reload+apply
      * alone, with train cost attributed to the learner queries that
      * already carry it.
      */
    setup: Option[(SparkSession, String) => Unit] = None,
)

/** Central registry; each operator family contributes its queries here. */
object Registry {
  def all: Seq[EngineQuery] =
    kmer.Kmers.engineQueries ++
      operators.Relational.engineQueries ++
      operators.BloomJoin.engineQueries ++
      operators.Cdc.engineQueries ++
      operators.Temporal.engineQueries ++
      operators.Profile.engineQueries ++
      operators.ZOrder.engineQueries ++
      operators.Analytic.engineQueries ++
      operators.EventFlow.engineQueries ++
      operators.MarketBasket.engineQueries ++
      operators.AsOf.engineQueries ++
      operators.GraphRank.engineQueries ++
      operators.RangeJoin.engineQueries ++
      text.TextAnalysis.engineQueries ++
      text.QualityFilters.engineQueries ++
      text.HashedLinear.engineQueries ++
      text.Perceptron.engineQueries ++
      text.CharEntropy.engineQueries ++
      text.LineDedup.engineQueries ++
      text.HeavyHitters.engineQueries ++
      text.CountMin.engineQueries ++
      text.Bm25.engineQueries ++
      text.Bpe.engineQueries ++
      text.Unigram.engineQueries ++
      text.BigramLm.engineQueries ++
      text.RougeL.engineQueries ++
      text.Mojibake.engineQueries ++
      dedup.SubstringDup.engineQueries ++
      dedup.SetSimJoin.engineQueries ++
      dedup.EditDistJoin.engineQueries ++
      curation.Curation.engineQueries ++
      curation.Drift.engineQueries ++
      curation.SketchOverlap.engineQueries ++
      curation.MaxCover.engineQueries ++
      dedup.SortedNeighborhood.engineQueries ++
      dedup.Winnow.engineQueries ++
      dedup.FellegiSunter.engineQueries ++
      text.Blocklist.engineQueries ++
      text.WordPiece.engineQueries ++
      operators.ExactQuantile.engineQueries ++
      operators.TopK.engineQueries ++
      dedup.Dedup.engineQueries ++
      dedup.UrlDedup.engineQueries ++
      similarity.Ann.engineQueries ++
      similarity.Dbscan.engineQueries ++
      similarity.KCenter.engineQueries ++
      similarity.Pq.engineQueries ++
      similarity.SemDedup.engineQueries ++
      similarity.Quantize.engineQueries ++
      similarity.HybridSearch.engineQueries ++
      streaming.EventAnalytics.engineQueries ++
      streaming.StatefulSessions.engineQueries ++
      multimodal.Multimodal.engineQueries ++
      sources.CorpusSource.engineQueries ++
      sources.PartitionedLayout.engineQueries ++
      sources.FormatSources.engineQueries ++
      sources.BucketedTables.engineQueries
}
