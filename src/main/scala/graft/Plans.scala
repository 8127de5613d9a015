package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit artifact generator: dumps `explain("formatted")` for the
  * load-bearing queries into PLANS.md, with the property each plan is
  * expected to exhibit. Re-run after operator changes:
  * `sbt "runMain graft.Plans"` (SPARK_GRAFT_SF_DIR optional).
  */
object Plans {

  private val audited: Seq[(String, String)] = Seq(
    "scan_project" ->
      "Filter and projection reach the parquet scan: `PushedFilters` carries the quantity predicate, `ReadSchema` lists only the 4 output columns.",
    "kmer_count" ->
      "Partial `HashAggregate` before the single exchange, final after — shuffle volume is distinct-kmers-per-partition, not the window stream. The `Generate kmergenerator` (lazy-collection CollectionGenerator) sits inside a `WholeStageCodegen` span — no position/window array per row.",
    "q1_pricing_summary" ->
      "One partial+final aggregate pair around one exchange; all four aggregates computed in a single pass over the scan (no re-reads).",
    "join_broadcast_revenue" ->
      "Both dimension joins are `BroadcastHashJoin` — the orders fact table is never shuffled for joining; the only exchange is the final small group-by.",
    "join_shuffle_lineitem_orders" ->
      "Declarative big-big join: at this test SF the optimizer sees orders under the broadcast threshold and picks `BroadcastHashJoin` (correct — smaller side fits); past the threshold the same plan becomes a both-sides hash-partition shuffle join with AQE skew splitting. The plan adapts to scale; the query doesn't change.",
    "topk_global" ->
      "`TakeOrderedAndProject`: per-partition top-k heaps merged on the driver — no global sort of 600k (or 100 TB of) rows.",
    "salted_group_count" ->
      "Two aggregate levels: (key, salt) partial+final, then key-level re-merge — a hot key's rows fan out over 32 reducers instead of one straggler.",
    "minhash_signatures" ->
      "No distinct and no extra exchange before the aggregation: the exploded shingle stream feeds a partial min-aggregate directly; only ≤16 mins per doc per partition cross the wire.",
    "ann_lsh_topk" ->
      "Bucket equi-join (broadcast here — the query side is tiny; hash-partition on bucket at corpus scale), then `WindowGroupLimit` pushes the rank<=k cut below the window sort — candidates are cut per partition before full materialization.",
    "events_hourly_rollup" ->
      "Tumbling-window rollup is a plain partial+final aggregate on (hour, type) — streaming twin shares the same shape with state instead of the final exchange.",
    "asof_event_last_order" ->
      "Point-in-time join as UNION + one window pass: both inputs exchange once on the key, a single sort per partition, `last(ignoreNulls)` carry — no |L|×|R|-per-key nested loop anywhere in the plan.",
    "asof_orders_same_day_max" ->
      "Events-free twin gate (one drifted source table must never empty the family's evidence — the r9 outage): the same UNION+window as-of shape self-applied to orders. No Join operator at all; every hash exchange keys on the as-of key (o_custkey pre-alias on the right's pre-aggregation, user_id on the union'd window input).",
    "range_join_value_bands" ->
      "Range predicate turned into a hash equi-join: the tiny interval side explodes into overlap buckets (`Generate`), the event side maps to one bucket, and the join is `BroadcastHashJoin`/hash — no BroadcastNestedLoopJoin node, which is what a raw `BETWEEN` join plans.",
    "range_join_price_bands" ->
      "Events-free twin gate of the band join over part retail prices — same bucket-explode + hash equi-join shape, no BroadcastNestedLoopJoin.",
    "embedding_dim_stats" ->
      "ANN whitening pre-pass: posexplode fans each quantized vector into (dim, value) pairs, and the ONE dim-keyed exchange carries |dims| rows per task — partial_sum/partial_min/partial_max combine map-side below it, so a 100 TB embedding corpus ships 64 rows per task to the reducers. Exact integer sums over the floor(x*1000) quantization, bit-identical in DuckDB.",
    "lang_adaptive_cut" ->
      "Per-language percentile_disc threshold, skew-safe: the corpus pays ONE (lang, score) histogram aggregation (map-side combine); the running/total windows and the percentile pick run over that histogram at value cardinality — a naive cume_dist over `partitionBy(lang)` would sort a whole language's corpus slice in one task — and the ≤|langs|-row threshold table returns by broadcast. Every hash exchange leads with lang; the threshold test is exact integer rank arithmetic (run*100 ≥ p*tot), so DuckDB's percentile_disc agrees bit-for-bit.",
    "cdc_agg_maintain" ->
      "Materialized-view delta maintenance: the stored per-group aggregate unions with ±(before/after-image) retraction terms derived from the change cohorts ALONE and re-aggregates — no Join node anywhere, so the refresh pays |changes|, never a rescan of the maintained base. The oracle recomputes from the fully merged table, proving maintenance ≡ recompute across cross-group moves.",
    "sample_weighted_priority" ->
      "Deterministic weighted sampling (priority sampling, Duffield–Lund–Thorup): priority w/u is a pure map expression (md5-derived u; only +,*,/ doubles, so DuckDB replays the exact bits), the per-language rank cut runs as `WindowGroupLimit` below the window sort — each partition retains only k candidates, no group materializes whole — and lang is the only hash-exchange key.",
    "ann_lsh_multiprobe" ->
      "Query side fans out ×(bits+1) probe buckets via `Generate explode`; the corpus side is scanned and bucketed once. Candidate dedup + `WindowGroupLimit` keep the rank cut per-partition.",
    "ann_ivf_topk" ->
      "IVF: centroids broadcast for the assignment pass (corpus never shuffles to be assigned), inverted-list equi-join on centroid id, exact re-rank under `WindowGroupLimit`.",
    "partitioned_scan_prune" ->
      "`PartitionFilters: [... (event_type = purchase)]` on the scan — four of five partition directories never open; the predicate never reaches row-level filtering.",
    "bucketed_join_revenue" ->
      "Both scans read `SelectedBucketsCount: 16 out of 16` pre-hashed buckets; the join needs no `Exchange hashpartitioning` on either input — the write-time bucket layout replaces the per-query shuffle (only the small post-join aggregation exchanges).",
    "minhash_lsh_pairs" ->
      "The per-band candidate cap is a `Window` count over the band key, so both self-join sides root in canonically identical band exchanges; this pre-execution dump shows the subtree twice, but the executed AQE plan replaces the second with `ReusedExchange` (verified live: `ShuffleQueryStage 8 +- ReusedExchange ... hashpartitioning(band_idx, band_val)`), so the shingle→signature pipeline runs ONCE, and a mass-duplicated band value is filtered before it can emit O(n²) pairs.",
    "shuffle_order" ->
      "Global deterministic order WITHOUT a single-partition window: per-bucket counts aggregate small, offsets broadcast back (`BroadcastHashJoin`), and the `Window` that ranks rows is `partitionBy(b)` — every window partition is a hash bucket, all of them in parallel.",
    "decontaminate_overlap" ->
      "Grams travel as 64-bit `NgramHashGenerator` rolling hashes on BOTH sides (r9 — no `concat_ws` gram string is ever built; pinned in `PlanAuditSpec`): the holdout hash set is the build side of a `BroadcastHashJoin` at 8 bytes/gram, the corpus gram-hash stream is filtered map-side and never shuffles; the only exchange is the final per-doc count aggregate. The broadcast is SIZE-GATED: `Curation.decontaminate` counts the distinct holdout hashes first and falls back to a shuffle hash join past `DefaultHoldoutBroadcastBudget` (64 MB) — same relation either way (pinned in `DecontaminateFallbackSpec`), so an eval-suite holdout too big for the driver can't kill the job at 100 TB. Probe-scale (min-of-3): 2.64s→1.64s vs the string formulation, identical shuffle records.",
    "skew_join_hot_key" ->
      "Join-key skew surface: 1% of both fact sides collapse onto one hot key and the `merge` hint pins the shuffle sort-merge path. This pre-execution dump shows plain `SortMergeJoin`; at runtime AQE's OptimizeSkewedJoin splits the oversized partition into advisory-sized mapper-range chunks — `SortMergeJoin(skew=true)` in the final adaptive plan, asserted live in `SkewJoinSpec` with thresholds scaled to test data. Salting covers aggregation skew (`salted_group_count`); this covers join skew, where the runtime split is the idiomatic fix.",
    "kmeans_step" ->
      "The Lloyd-iteration plan — dumped from the single-step query because kmeansConverged's returned frame is a localCheckpoint scan (the loop's per-iteration plans are exactly this one, re-planned against each checkpointed centroid table): centroids are always the `BroadcastExchange` side of the assignment — the embedding corpus NEVER shuffles to be assigned; the only hash exchanges are the (cid, dim) update aggregation. The converged loop's driver-side fixed-point check is exact integer equality on the quantized centroids, so early stop ≡ the fixed-iteration oracle.",
    "pack_sequences_scalable" ->
      "Scale-safe prefix aggregate — shuffleOrder's decomposition generalized from row numbering to a running token total. `pack_sequences` is one window partition per language (an `en` partition = most of a 100 TB corpus on one reducer); this plan buckets by order-aligned doc_id ranges, aggregates per-(lang, bucket) sums small, broadcasts the ≤buckets-row offset table back (`BroadcastHashJoin`), and ranks inside `Window partitionBy(lang, b)` — every window partition is one bucket, all in parallel. Output is EXACTLY the single-window relation (same DuckDB oracle, equality pinned for 1/32/512 buckets in `ScalablePrefixSpec`).",
    "price_quartiles_scalable" ->
      "Scale-safe quantile bucketing — the ntile twin. Exact `ntile(4) OVER (PARTITION BY priority)` sorts each priority in ONE window partition (five straggler reducers at 100 TB); here per-group p25/p50/p75 come from a bounded-state `approx_percentile` aggregate whose tiny result broadcasts back, and bucket assignment is a comparison projection — the fact stream never window-sorts. Shares are 0.25 ± sketch rank error; the gate asserts the share brackets (self-verifying booleans).",
    "rolling_distinct_users" ->
      "Rolling 7-day distinct users WITHOUT rescanning rows per window: one HLL sketch per day (partial+final ObjectHashAggregate), then a windowed `hll_union_agg` merges 7 stored sketches per output row. The window runs over per-DAY rows — bounded cardinality at any corpus scale (like moving_avg_daily_revenue) — on a value-based day-number RANGE frame. The exact twin computed alongside for the self-verifying bracket is itself distributed (7-way fan-out of distinct (day,user) pairs, no per-window rescan).",
    "asof_tolerance_1h" ->
      "Bounded-staleness as-of: the same single UNION+window pass as asof_event_last_order (one exchange + one sort on the key, no per-key theta-join), with the matched TIME carried next to the payload so staleness is a projection — tolerance adds zero exchanges.",
    "ann_ivf_trained_topk" ->
      "Composed train→index→search: kmeansConverged's broadcast Lloyd iterations run first (driver-orchestrated, corpus never shuffles for assignment), the trained centroid table is localCheckpointed so training executes ONCE, then the shared IVF search broadcasts it for corpus assignment and query probing — the only exchanges are the inverted-list equi-join and the rank window.",
    "length_trim_p99_approx" ->
      "The scale-safe trim path: `approx_percentile` runs as a partial+final `ObjectHashAggregate` with O(accuracy) sketch state — unlike exact `percentile` (used by `length_trim_p99`/`percentile_prices` as small-scale oracle anchors), whose aggregation buffer holds every distinct value per group and becomes unbounded at 100 TB. The threshold is one broadcast scalar; the corpus-side filter never shuffles.",
    "sample_stratified" ->
      "Deterministic sampling is filter+project over the scan — the sampling itself adds NO exchange (the only one in the plan is the gate query's output ORDER BY); the per-stratum rate is a CASE column, not a per-stratum pass.",
    "gopher_quality_flags" ->
      "All seven Gopher rules are per-row array-lambda projections over the tokenized text — the plan has NO hash exchange at all (the only exchange is the gate query's output ORDER BY range partitioning); at 100 TB this is a pure map stage.",
    "c4_line_filter" ->
      "Line filtering (terminal punctuation, word count, javascript/brace, lorem-ipsum) is a single `filter(...)` array lambda inside a projection — like the Gopher flags, zero hash exchanges; the md5 of the cleaned text is computed in the same map pass.",
    "substring_dup_stats" ->
      "Exact substring-duplication at scale: every length-k character window is hashed map-side, and the content-defined keep-filter (`substr(md5, 32, 1) IN ('0','8')` — keep probability 1/8) runs BEFORE any exchange, so the only wide operations are the two partial+final aggregations on the kept gram hash (dup-hash detection, then the per-doc left join re-aggregation on the same key, which AQE serves from the reused exchange). No all-pairs join, nothing driver-side.",
    "heavy_hitters" ->
      "The exact two-pass heavy-hitters plan: pass 1 is ONE global aggregation computing both the Misra–Gries candidate summary and the exact stream length (a partial `ObjectHashAggregate` per partition, then a single-partition final merge of ≤k-entry maps — bytes on the wire are O(k × partitions), never the token stream); pass 2 recounts ONLY candidate tokens behind a `BroadcastHashJoin` against the ≤k-row exploded summary, so the full-vocabulary `GROUP BY term` shuffle this replaces never happens — the one hash exchange carries tokens that survived the broadcast filter.",
    "line_dedup_corpus" ->
      "Corpus-level boilerplate removal: lines cross the wire only as md5 hashes (the frequency aggregation is partial+final on the 16-byte hash), the common-line membership join back is declarative (AQE broadcasts the small common set at this SF; same plan hash-joins at scale), and the order-preserving document rebuild is a per-doc `collect_list` bounded by the document's own row size. No all-pairs, nothing driver-side.",
    "gopher_repetition_ngrams" ->
      "ONE `Generate ngramhashgenerator` pass (custom lazy CollectionGenerator, inside WholeStageCodegen) emits (n, rolling-hash, joined-length) for ALL 9 n-sizes — one xxh64 per token plus O(1) prefix arithmetic per window; the n-gram STRING never exists (only count×length mass reaches the output), so the aggregation hash map and the exchange carry 8-byte hashes instead of ~50-byte strings. The 10× probe moved from 8.7× time ratio / +3 GB peak RSS (string formulation) to ~1.3× / no spike. Within-doc repeats collapse map-side; the per-(doc, n) rollup is a second small aggregation. Both exchanges are keyed by doc-scoped composites — state is bounded by per-document vocabulary, never corpus-global.",
    "gopher_repetition_lines" ->
      "Same doc-scoped shape as the n-gram family at line granularity: lines explode from the text in the map stage, the (doc, trimmed-line) count collapses repeats via partial aggregation, and the per-doc rollup keys on doc_id — both exchanges lead with doc_id, bounded by per-document line counts.",
    "bloom_semi_join_pruned" ->
      "Runtime-filter join pruning: the 16 KiB bitmap is ONE row built by a partial+final `bit_or` aggregate (shuffle volume ≤ 4096 words per partition, independent of build size) and arrives at the probe via a single-row `BroadcastNestedLoopJoin` cross — so the five bit tests run as scan-side scalar filters BEFORE the probe rows reach the exact semi-join's exchange. At 100 TB the semi-join shuffles only Bloom survivors; the oracle is the PLAIN semi-join, pinning transparency.",
    "setsim_jaccard_join" ->
      "Lossless prefix-filtered similarity join: the df join shuffles the token stream once; the prefix rank is a doc_id-PARTITIONED window (never a global sort — the global token order is the (df, tok) value itself); the candidate equi-join carries only each doc's rarest ~(1−t) tokens AND the PPJoin positional filter (min(rank_a, rank_b) + min(sz−rank) upper-bounds the overlap for every shared-token row, so rows that cannot reach α = ceil(t/(1+t)·(sz_a+sz_b)) drop before the distinct — lossless because a qualifying pair passes on ALL its rows); verification is a candidate-bounded `array_intersect` projection behind two joins to per-doc token arrays. Nothing quadratic in the corpus — only in the true near-dup cliques of the OUTPUT.",
    "countmin_token_freq" ->
      "Count-Min build: the ×4 cell explode collapses to ≤ d·w=16384 rows per partition via partial aggregation BEFORE the one exchange — shuffle volume is the grid, not the token stream. The gate query builds the grid WEIGHTED from the exact per-token counts it needs anyway (cell accumulates sum(cnt) — identical grid by associativity, but md5 per DISTINCT token instead of per occurrence, and the token-count aggregate subplan is shared with the top-k branch). The finished sketch is a single row crossed in by broadcast; point estimates are four `element_at` scalar projections per key.",
    "hashed_linear_score" ->
      "fastText-style scoring is a pure map stage: tokenize → bigram → hash → integer weight-sum all inside one array-lambda projection; the plan has NO hash exchange (the only exchange is the gate's output ORDER BY). At 100 TB this is scan-bound — the ideal shape for corpus-wide classifier sweeps.",
    "char_entropy_quality" ->
      "Character-entropy filtering is a pure map stage like hashed_linear_score: per-row alphabet-bounded char histogram + fixed-point qlog2 folds, all array-lambda projections inside one codegen span; NO hash exchange (the only exchange is the gate's output ORDER BY) — scan-bound at 100 TB, the zero-shuffle floor for corpus quality sweeps.",
    "profile_lineitem" ->
      "ANALYZE in one pass: every column's null/distinct/min/max aggregates in a SINGLE aggregation (the multiple exact COUNT(DISTINCT)s plan as one `Expand`-based aggregate — one shuffle, map-side ×(ncols+1) expansion). No per-column scans. The 100 TB knob is swapping exact distinct for `approx_count_distinct`, which drops the Expand.",
    "cdc_merge_upsert" ->
      "MERGE INTO as ONE full-outer shuffle join on the merge key — update, delete, and insert all resolve as projections of the same join (no per-verb subqueries, no union of three joins). With the base table bucketed on the key the base side's exchange disappears entirely (the merge-on-read layout argument). SCD2 history is a second projection of the SAME join, not a second pass.",
    "zorder_skipping_stats" ->
      "Both layouts' file ids are per-row integer bit expressions over keys scaled to the 16-bit domain by the table's maxima — ONE one-row aggregate crossed in by broadcast, then projection + a 64-group partial+final aggregate per layout (map-side combine; no window, no shuffle join, no global sort). At 100 TB the SAME scaled zValue expression feeds repartitionByRange before the writer; this query is the read-side effect, quantified.",
    "ann_pq_adc_topk" ->
      "PQ at scan scale: the S·C-row codebook broadcasts into the corpus code-assignment join (corpus never shuffles to be coded; the only wide op is the (vec, subspace)-keyed argmin, S rows per vector); the query ADC table broadcasts back, and the per-(query, vector) distance is a sum of S integers. The rank cut runs under WindowGroupLimit. Composing with IVF's inverted lists restricts WHICH codes are scanned — classic IVF-PQ.",
    "semdedup_prune" ->
      "Semantic dedup (SemDeDup): kmeansConverged's broadcast Lloyd loop trains the centroids driver-orchestrated (corpus never shuffles for assignment), the per-vector assignment is ONE broadcast join + per-vector row_number materialized once as a localCheckpoint (the real-pipeline analog is a written assignment table — its three consumers, both self-join sides and the verdict spine, scan the checkpoint instead of re-running the train loop), and the pairwise cosine step shuffles the corpus ONCE, keyed by cluster id — quadratic only WITHIN a cluster, with `m` the knob that pins cluster size as N grows (m ≈ N/targetClusterSize in production; the m=16 here is gate-scale). The keep rule is the same smaller-id-wins greedy as dedup_apply_keep, so the verdict is an EXISTS-shaped max-aggregate + left join, no global sort.",
    "bm25_top_docs" ->
      "Inverted-index probe: query terms broadcast into the token-stream semi-join, so the tf aggregation shuffles ONLY query-term occurrences, never the vocabulary; dl is a doc-keyed aggregate; N/avgdl reduce to one broadcast row; the per-term top-k cut sits under WindowGroupLimit. The full-vocab df aggregate exists only because the gate derives its query terms from the corpus.",
    "bigram_lm_fluency" ->
      "Self-trained bigram LM scoring in exact integers: the model is two partial+final count aggregations (unigram ~vocab, bigram corpus-supported), cnt1 rides inside the model row (ONE scoring join on (w1, w2), not two), and the per-doc rollup keys on doc_id. No float log anywhere — a 10^5-term ln() sum would drift a ulp per term across engines; scaled integer division cannot.",
    "token_budget_select" ->
      "Budget-bounded best-first selection — shuffleOrder's prefix decomposition generalized to a quality-ordered running TOKEN total. A naive `sum(n_tokens) OVER (ORDER BY score DESC)` is one window partition holding the corpus; here the score quantizes into ≤50 buckets (score is monotone in its bucket, so bucketed order = global order), per-bucket token totals aggregate tiny (the offsets prefix window runs over that ≤50-row relation — the plan's one `Exchange SinglePartition` is driver-sized by construction), offsets broadcast back (`BroadcastHashJoin`), and the corpus-sized cumulative sum is `Window partitionBy(qb)` — all buckets in parallel. The budget cut is a single-row broadcast cross + exact integer comparison `(tt*2) div 5`, so both engines cut at the same row. The quality subexpression is computed twice (once per branch) — two map-only corpus passes, the standard trade against materializing the scored corpus; identical to shuffle_order/pack_sequences_scalable's offsets shape.",
    "bpe_pair_counts" ->
      "BPE candidate table: ONE corpus-linear pass (word explode → partial+final count on the word — the plan's first hash exchange), then everything downstream is VOCABULARY-scale: the adjacent-pair `Generate` consumes the aggregated (w, c) relation, and the pair-count aggregation (second hash exchange) shuffles distinct-pair rows weighted by word counts — the occurrences-to-weights trick (`CountMin.sketchWeighted` precedent), so a 100 TB corpus pays its vocabulary, not its token stream, for every BPE statistic. `bpe_learn_merges` iterates exactly this plan over the evolving symbol table (localCheckpoint per step, previous step's blocks released, ONE argmax row to the driver per merge — the Lloyd-loop discipline), so its per-iteration plan is this one and its final frame is a driver-local ≤numMerges-row relation, which is why the dump audits the pair-count plan rather than the loop's LocalTableScan.",
    "quality_threshold_sweep" ->
      "Data-budget planning curve: every candidate quality threshold's survivor count in one pass. The corpus pays ONE scored partial+final aggregation into ≤20 bins; the cumulative-from-the-top windows run over that ≤20-row relation, so the plan's single-partition window is driver-sized by construction (the token_budget_select offsets discipline). Bin arithmetic is floor(score·20) over bit-identical doubles — both engines bin identically.",
    "paragraph_dedup" ->
      "Paragraph rung of the dedup granularity ladder (doc/paragraph/line/substring): paragraphs cross the wire only as md5 hashes — the corpus-wide frequency aggregation is partial+final on the 16-byte hash, the boilerplate-membership join back is declarative (AQE broadcasts the small common set; hash-joins at scale), and the order-preserving rebuild is a per-doc collect_list bounded by the document's own row. Identical shape to line_dedup_corpus one level up.",
    "minhash_candidate_precision" ->
      "LSH calibration evidence: exact Jaccard (decile-bucketed in exact integer arithmetic) over the banding's CANDIDATE pairs only. The shingle-intersection join keys on (doc, shingle) behind the already-capped candidate set, so the quadratic mass is the surviving candidates — never corpus². The per-doc shingle-set sizes come from one distinct+aggregate on the same shingle stream.",
    "decontaminate_fuzzy" ->
      "Near-dup benchmark decontamination (the exact-overlap family's fuzzy twin): ONE banding pass over the corpus, the holdout slice of the banded table is tiny (band-keyed equi-join; broadcast when it fits), the per-band cap bounds degenerate boilerplate bands exactly as in candidate generation, and the verdict is a doc_id-keyed distinct-holdout count — no quadratic path, no second corpus scan.",
    "source_cap_sample" ->
      "Per-source dominance cap (the per-host cap of crawl curation): deterministic md5 priority, rank cut as WindowGroupLimit below the window sort — each partition retains ≤ cap candidates per source, no source group materializes whole; source is the only wide key.",
    "neardup_cc_step" ->
      "The connected-components loop's per-iteration plan, standalone (the loop's own returned frame is a post-loop checkpoint scan — the kmeans_step discipline): neighbor labels arrive via a hash EQUI-join on the edge endpoint (never a nested-loop product), merge with the self-carry union, and collapse in a node-keyed partial+final min aggregate — per iteration the wire carries one |edges|-keyed join plus |nodes| label rows, nothing quadratic. In the real loop the label side is a localCheckpoint scan (blocks released per generation — `Checkpoints.localEager`), convergence reads off the same aggregate via the carried `old` column (no extra comparison join), and iterations-to-convergence is pinned: quasi-cliques (the dedup shape) converge in 1 confirming pass, chains in diameter hops (`ConnectedComponentsSpec`), with the probe artifact recording the count at probe scale (`cc_iterations`).",
    "curated_corpus" ->
      "The composed curation pipeline — quality gate ∧ near-dup keep-set ∧ split — and the most expensive headline. Composition is by LEFT SEMI id-set intersection: the documents fact stream is FILTERED, never widened (no column from either gate survives the join), and the dedup keep-set attaches as a LeftAnti against the drop list. By dump time the MinHash→LSH→CC sub-pipeline already ran (driver-orchestrated loop), so its leaf here is the one materialized localCheckpoint label table — train-once/scan-many (the SemDedup-assignments discipline); the band-join + per-band cap that bound its candidate generation are audited live in `minhash_lsh_pairs` (ReusedExchange) and the per-iteration shape in `neardup_cc_step`. The final per-(lang, split) rollup is one partial+final aggregate. Each composed stage scans documents once; the stages meet only on doc_id sets.",
    "graph_pagerank_parts" ->
      "Iterative link analysis (the web-graph centrality family of crawl curation) as statically-unrolled joins: the within-order pair expansion is an equi-join on l_orderkey — bounded by order size, O(rows·avg_order_size), never table-quadratic — and each of the 3 rank iterations is one src-keyed hash join (pr ⋈ outdeg, both pre-aggregated) plus one dst-keyed partial+final sum. All arithmetic is BIGINT nano-ranks (pr div outdeg, 15%+85% blend in integers), so the result is partitioning- and summation-order-independent — which is what lets DuckDB's unrolled-CTE oracle agree bit-for-bit. The final top-20 is TakeOrderedAndProject, not a global sort. At cluster scale the edge relation would be cached/bucketed on src so iterations 2..k re-use its layout; a convergence-driven variant would checkpoint per iteration exactly as neardup_cc_step does.",
    "dsir_importance_select" ->
      "DSIR-style importance selection (arXiv:2302.03169 re-expressed in exact integers): one tokenize pass feeds two partial+final count aggregations (target slice and full corpus), the vocabulary-scale weight table joins back to the token stream on the token key (AQE broadcasts it at gate scale; hash-partitions on token when a 100 TB vocabulary outgrows the driver), the per-doc score is one more doc_id-keyed map-side-combined sum, and the cut is TakeOrderedAndProject. The log-likelihood-ratio weight is replaced by the exact integer ratio cnt_t·1e6 div cnt_r — a monotone ranking surrogate, which is all selection needs and what makes both engines agree exactly.",
    "curation_funnel" ->
      "Pipeline observability — per-stage survivor counts (raw→quality→exact-dedup→repetition) in one composed plan: the dup-rank window partitions on md5(text) (dup groups are tiny, no skew), the repetition side is the standard two-level token aggregation joined back on doc_id, and the funnel itself collapses to a SINGLE 1-row aggregate exploded into 4 labeled stage rows — the audit costs no more than the most expensive stage it audits, and adds no exchange beyond theirs.",
    "dq_constraint_audit" ->
      "Deequ-style ingest validation: each table's domain/range rules share ONE conditional-aggregation scan (no per-rule passes); referential integrity is a key-only LeftAnti count; the temporal rule is one equi-join on the key the tables would be bucketed by. All branches collapse to single-row aggregates — the audit's wide work is two joins, nothing else. The shipdate rule genuinely fails on this data, so the gate proves violation counting rather than all-zero agreement.",
    "cohort_retention" ->
      "Growth-analytics cohort matrix: the event stream collapses FIRST to distinct (user, week) — the big partial+final reduction — then the first-seen minimum is a WINDOW over the collapsed relation reusing the user_id exchange the distinct established (no Join operator in the plan; the former min-then-self-join paid a second shuffle and a join for the same answer). The permille division runs on the |weeks|²-row matrix; week bucketing is exact integer epoch-ms division so both engines agree.",
    "langid_auc" ->
      "Threshold-free classifier eval: ONE tokenize pass collapses the corpus to per-SCORE (pos, neg) counts — score cardinality is max stopword hits, a few hundred — so the Mann-Whitney prefix window runs at score cardinality over a single tiny partition, never on the corpus, and the driver receives one exact-integer row (n_pos, n_neg, auc_x2, auc_permille). Ties get the standard half-credit via the 2·below+at identity, all in int64.",
    "decontaminate_semantic" ->
      "Embedding-space decontamination (the paraphrase-proof complement of the word-n-gram family): the eval-set side is benchmark-sized and BROADCASTS; the sign-LSH bucket is the equi-join key so each corpus vector meets only same-bucket benchmark vectors — the corpus is never shuffled and never self-joined. Cosine verification is the codegen'd exact-integer dot_i64 over quantized components; the one float op (sqrt-norm division) is bit-identical in both engines.",
    "ewma_revenue_daily" ->
      "Exact-integer EWMA (α=1/2, 20-day kernel): ONE fact aggregation collapses orders to day cardinality and is localCheckpointed (by dump time its four consumers — bounds, spine fill, convolution, final join — are `Scan ExistingRDD` leaves; the un-checkpointed plan re-scanned orders 5×). Everything after runs at |days| rows. The EWMA recurrence would be a sequential float fold — non-distributable and engine-divergent; the power-of-two truncated kernel makes it an integer convolution both engines replay bit-identically.",
    "gram_power_iteration" ->
      "PCA power iteration on sufficient statistics: the corpus pays the Gram generate+aggregate ONCE, localCheckpointed (by dump time the seven consumers — two mirror branches × three iterations — are `Scan ExistingRDD` leaves; un-checkpointed, the plan re-ran the corpus pass 6×). Every iteration is a 64×64-matrix⋈broadcast-64-row-vector join, so iterating is free at 100 TB and there is no driver-side linear algebra. Rescaling divides the ABSOLUTE value and reapplies the sign outside, because Spark div truncates while DuckDB // floors on negatives.",
    "sample_apportioned" ->
      "Exact-total (Hamilton largest-remainder) mixture sampling: the corpus collapses to |sources| stratum counts, the apportionment arithmetic windows over that tiny relation and broadcasts the quotas back, and the pick is an md5-rank window PARTITIONED by source cut at quota — exactly `budget` rows out, no global sort, no RNG state. Rate-based stratified sampling can miss a fixed budget by rounding; mixtures are specified by exact budgets.",
    "sql_q8_market_share" ->
      "The widest join graph in the registry (8 relations, nation twice under aliases): all seven joins plan as BroadcastHashJoin at this SF (orders fits the threshold too); at scale the lineitem⋈orders spine becomes the one shuffle join while the true dims keep broadcasting — the plan adapts, the query doesn't change. The market share is a conditional aggregate over ONE fact pass (a per-nation/total split would scan lineitem twice), and the date band pushes to the orders scan.",
    "sql_q11_important_parts" ->
      "Global-threshold screen: the filtered supplier-region relation aggregates twice (per-part and the one-row global sum), but the threshold side collapses to a single row that broadcasts into the HAVING filter — the per-part aggregate is never re-scanned per group, and the comparison is cross-multiplied int64 (no division at the decision boundary).",
    "sql_q15_top_supplier" ->
      "Derived aggregate view consumed twice (join side + scalar max): Spark inlines the CTE into both consumers, but each side prunes to the same 3-column scan with the quarter band pushed down, and the per-supplier aggregate is supplier-cardinality tiny — the max side reduces to ONE scalar row, never a per-row probe. Exact-integer revenue (e4 units) makes the max-equality deterministic — a float formulation could drop or duplicate tie rows across engines.",
    "sql_q17_small_qty_rev" ->
      "Correlated scalar aggregate (each line vs 0.2× its own part's mean quantity): Catalyst decorrelates into ONE per-part average + an equi-join on partkey — the plan must show an Aggregate feeding a join, never a per-row subquery re-execution. The brand filter prunes the probe side at the part scan before the join.",
    "sql_q2_min_cost_supplier" ->
      "Correlated scalar-min over the derived offers relation (the partsupp stand-in): Catalyst decorrelates into ONE regional per-part min aggregate + a p_partkey equi-join back to the outer side — no per-row subquery re-execution. The inlined offers CTE appears twice (outer + min side), but each copy prunes to a 3-column lineitem scan feeding a partial+final (l_partkey, l_suppkey) aggregate — distinct-pairs cardinality, not the row stream, crosses each wire — and the supplier→nation→region chain broadcasts on both sides. Completes the 22-query TPC-H suite.",
    "sql_q21_waiting_suppliers" ->
      "The EXISTS/NOT EXISTS double correlation on the same fact table becomes a LeftSemi plus a LeftAnti hash join on l_orderkey (the anti side carrying the outer o_orderdate lateness predicate as a join condition) — no nested-loop and no per-row re-execution; the region→nation→supplier chain broadcasts, and the top-20 is a TakeOrderedAndProject, not a global sort.",
    "sql_q19_brand_bands" ->
      "Disjunctive join predicate: the common p_partkey=l_partkey conjunct factors OUT of the three OR'd brand/size/quantity bands into the hash-join key (a non-factoring plan nested-loops the whole disjunction), the per-branch residual evaluates as a post-probe filter, and the part dim broadcasts. The classic Q19 optimizer stress.",
    "skew_join_preagg" ->
      "Eager aggregation through the skewed join: both sides collapse to per-key aggregates BEFORE joining and the counts multiply back (Σ o_cnt·li_cnt), so the hot bucket's |li|×|o| cross product — quadratic under scale, and INVISIBLE to AQE's skew split because the bucket's map-output bytes stay tiny while its join OUTPUT explodes — is never enumerated. The gate's oracle is deliberately the naive pair-enumerating SQL: eager aggregation ≡ the cross product it avoids, proven exact. skew_join_hot_key remains the bench-scale AQE stress; this is the formulation a 100 TB job runs.",
    "sql_q5_local_supplier" ->
      "The 6-table TPC-H Q5 star: the selective region→nation→supplier chain and the dims broadcast onto the fact spine (BroadcastHashJoin ≥3; lineitem never hash-exchanges for a dimension attach), the date band pushes to the orders scan, and the locality condition c_nationkey=s_nationkey rides the supplier join as a post-probe filter instead of a second shuffle. At cluster scale the customer/orders joins degrade gracefully to spine-keyed shuffles while the region/nation/supplier chain stays broadcast — the query text doesn't change.",
    "sql_q7_volume_shipping" ->
      "Volume shipping between a nation pair: the same tiny nation dim broadcasts TWICE under different aliases (supplier side / customer side), the symmetric OR-pair filter prunes right above those attaches before the (nation, nation, year) aggregate, and ship-year is exact integer year() in both engines. No fact-side exchange for any dimension.",
    "sql_q18_large_orders" ->
      "Large-volume orders: the HAVING pre-aggregation reduces lineitem to qualifying order keys BEFORE customer/orders attach (the wide table never joins unfiltered), quantities sum in exact DECIMAL, and the top-20 is a TakeOrderedAndProject over the joined result — no global sort.",
    "sql_q10_returned_items" ->
      "Returned-item reporting: quarter band and returnflag both reach their scans as PushedFilters, the per-customer aggregate shuffles once on the group key, and the top-20 is a TakeOrderedAndProject (per-partition heaps, driver merge) — no global sort of the customer aggregate.",
    "embedding_centroid_shift" ->
      "Embedding-space drift: one corpus pass quantizes inline (label carried — no vec_id join back) and collapses to (label, dim) partial+final sums, ≤|labels|·64 rows over the exchange; the cohort pairing self-joins at that collapsed cardinality and the exact-rational centroid L1 (|s_a·n_b − s_b·n_a| summed over dims before ONE integer division) never materializes a float mean.",
    "vocab_drift_topk" ->
      "Vocabulary churn: ONE tokenize pass carries both cohorts via conditional flags (no two filtered corpus branches), collapses to (cohort, term) counts at vocab cardinality, per-cohort top-k is a WindowGroupLimit cut with a total (cnt DESC, term) order, and the ≤2k-row top relation folds to one driver row of exact-integer Jaccard.",
    "snapshot_acceptance" ->
      "The composed promote/reject report: TV distance, top-k vocab overlap, exact-dup leakage of B into A, and the alpha-quality gap fuse by 1-row broadcast carriers (the events_kpi_snapshot pattern), so the report costs exactly the sum of its audited parts. The dup check carries both cohorts as flags through ONE md5-keyed aggregation — no A-vs-B equi-join, no second corpus scan for the incumbent side.",
    "corpus_drift_bins" ->
      "Distribution-shift audit: the corpus collapses to ≤64 per-length-bin cohort counts in one map-side-combined aggregate (bin = length(bin(n_chars)), pure integer); totals are a global window at bin cardinality and the signed ppm gap divides AFTER taking |d| (Spark div truncates, DuckDB // floors — the sign must not ride the division). The 10⁶-scaled cross-multiplied numerators run in DECIMAL(38,0) (int64 wraps at ~3·10⁶ docs/cohort) — the wide lane exists only at bin cardinality.",
    "corpus_drift_ks" ->
      "Kolmogorov–Smirnov companion to the TV distance: the corpus collapses map-side to per-LENGTH cohort counts (distinct n_chars cardinality); the CDF prefix windows and the argmax over |cum_a·N_b − cum_b·N_a| run at that cardinality on a single documented tiny partition (the langid_auc score-window shape); the peak location resolves ties by min length (total order) and the one division happens after the DECIMAL(38,0) max.",
    "kmv_cohort_overlap" ->
      "Join-free corpus overlap: ONE map-side-combined distinct on (cohort, content-hash) — the same exchange exact dedup pays — then the per-cohort k-smallest cut runs as WindowGroupLimit (≤k rows per cohort leave each map partition; the sketch, not the corpus, crosses the second exchange). The merged-sketch estimate and the exact flag-aggregated Jaccard ride the same hash relation; no A-vs-B join anywhere. At 100 TB the k-row sketches are the only thing two corpora ever exchange.",
    "snm_neardup_pairs" ->
      "Sorted-neighborhood blocking: the global sort rank is bucket-decomposed and bounds-invariant (approx_percentile range bounds → per-bucket counts → broadcast offsets + per-bucket row_number ≡ global row_number for ANY bounds) — no single-partition window touches the corpus. Candidates come from an equi-join on rank+o (o ∈ 1..w): rank is a permutation, so the join shuffle is perfectly balanced — the anti-skew ideal — and output is hard-bounded at w·N pairs. Per-candidate Levenshtein on the 32-char normalized prefix verifies; no CartesianProduct, no BroadcastNestedLoopJoin.",
    "phrase_mining_pmi" ->
      "Word2vec phrase promotion: one token pass → vocab-scale unigram counts, one bigram pass → corpus-supported pair counts with the minCount cut applied BEFORE the cnta/cntb attach joins (the pair table shrinks before it ever joins), single-row total via broadcast cross, TakeOrderedAndProject for the top-k. The PMI-ish score is a monotone exact-integer surrogate — ranking is the contract, so DuckDB agrees without float discipline.",
    "ccnet_perplexity_buckets" ->
      "CCNet head/middle/tail bucketing per language: the corpus pays the bigram fluency pipeline (already audited in bigram_lm_fluency) plus ONE (lang, m) histogram aggregation; the tercile thresholds come from exact integer rank tests (run·3 ≥ tot) over the value-cardinality histogram — no cume_dist window over a language's whole corpus slice — and the ≤|langs|-row threshold tables broadcast back into a pure projection bucket assign.",
    "bpe_tokenize_stats" ->
      "The tokenizer's APPLICATION half — the step that pays the corpus. By dump time the 8-iteration learner already ran (driver-orchestrated, vocabulary-scale), so the plan's trained-vocabulary leaf is a localCheckpoint `Scan ExistingRDD` (the SemDedup-assignments discipline: train once, consumers scan the materialization); each vocabulary row projects to (word = concat of symbols, n_sym = symbol count) — no second merge replay — and the corpus word stream equi-joins it BY WORD (AQE broadcasts the vocab at gate scale; hash-partitions on the word when a 100 TB corpus's vocabulary outgrows the driver), with the per-doc rollup one doc_id-keyed partial+final aggregate.",
    "graph_triangle_counts" ->
      "Degree-ordered triangle counting (Schank–Wagner orientation): every join in the plan is a hash EQUI-join — the degree-inequality orientation is applied to the edge relation before the wedge self-join, so a hub of degree d keeps only its ≥d-degree neighbors and wedge work is O(m^1.5), not Σd². Corner fanout is a lazy `Generate explode` and the per-node counts combine map-side below the node-keyed exchange. No CartesianProduct / BroadcastNestedLoopJoin anywhere.",
    "embedding_sq8_recall" ->
      "int8 scalar quantization recall probe: the per-dim min/max bounds collapse to a single-row array carrier that rides a broadcast crossJoin back over the corpus (the mixture-budget carrier shape) — quantizing is ONE corpus pass with no corpus shuffle; both the exact and SQ8 top-k rankings broadcast the bounded query side over the corpus and cut rank≤k per partition via `WindowGroupLimit` before any window materializes a full candidate list.",
    "embedding_outliers" ->
      "Diagonal-Mahalanobis curation cut: per-dim moments aggregate with map-side partials (64 rows per task through the exchange), return as a 1-row broadcast carrier, and the per-vector χ²-style score is a pure projection — the top-n then runs as `TakeOrderedAndProject` (per-partition heaps merged on the driver), never a global sort of the corpus.",
    "events_hourly_anomaly" ->
      "Ops-monitoring anomaly scan: the corpus-wide work is ONE (hour, type) partial+final count aggregate; the trailing-24h RANGE-frame 3-sigma test consumes that hour-cardinality output (window exchange keys on event_type, input is |hours| rows regardless of stream volume). Integer cross-multiplied test — no sqrt, no float accumulation — and no Join node anywhere. The streaming twin maintains the identical aggregate in complete mode and runs the identical detector downstream.",
    "vocab_growth_curve" ->
      "Heaps-law curve without per-prefix distinct passes: each term reduces to its FIRST bucket via a vocabulary-scale min-aggregate (map-side combine), per-bucket new-type counts aggregate from that, and the cumulative window runs over |buckets| (=16) rows. The corpus pays one token pass; nothing self-joins.",
    "hybrid_search_rrf" ->
      "Sparse+dense fusion: both input rankings are rank≤depth cut per partition (`WindowGroupLimit`) before anything fuses, so the FullOuter fusion join and the final sort cost k — corpus-scale work stays inside the audited BM25 inverted-index probe and the ANN ranking, and the fused score is pure integer rank arithmetic.",
    "hilbert_skipping_stats" ->
      "Write-time layout assignment quantified: Hilbert index is a chain of per-level projections (linear-size expression tree — a nested formulation would double per level), per-file min/max stats combine map-side below the two fid-keyed exchanges, and the contiguous-run lag window runs over the ≤64-row must-read file list. The metric the gate pins: identical file/row counts to Z-order under the seam-straddling predicate, strictly fewer contiguous scan ranges (3 vs 4 at sf0.1).",
    "cusum_revenue_shift" ->
      "CUSUM changepoint scan in closed window form: the corpus reduces to daily totals (partial+final decimal sum), the reference drift and prefix windows run at DAY cardinality, and S_t = P_t − min(0, running-min P) replaces the sequential max(0, s+x−k) recurrence — proven equal in AnalyticSpec. All integer cents; the 1-row mean rides a broadcast carrier; no self-join.",
    "attribution_touch_revenue" ->
      "Multi-touch attribution without the naive purchase×engagement self-join: ONE ignoreNulls first/last window pass over the user-partitioned stream (user_id is the only wide exchange key), then a ≤(channels+1)² aggregate. No Join node in the plan at all.",
    "skyline_parts" ->
      "2-D Pareto frontier the scale-correct way: the frontier needs only MIN(size) per price, so the corpus pays one price-keyed min aggregate (map-side combine) and the running-min dominance window consumes value-cardinality rows — never the quadratic NOT EXISTS dominance join.",
    "ols_tokens_by_lang" ->
      "Grouped regression as ONE moments pass: a single scan of documents feeds n/Σx/Σy/Σx²/Σxy per language (partial aggregation below the lang-keyed exchange), and the slope emerges as an exact integer rational in the projection — no float division in-engine, no per-moment scans, no join.",
    "phrase_match_docs" ->
      "Positional posting-list intersection: bigram selection is a per-row zip + vocabulary-scale count; the chosen phrase broadcasts, the corpus token stream filters to the TWO query terms before any shuffle, and the (doc, pos+1) match is a hash equi-join of two posting lists — the Lucene phrase-query shape on Spark.",
    "graph_kcore_nodes" ->
      "Iterative peeling to an exact degree fixed point: each round is one map-side-combined degree aggregate + two endpoint semi-filters on the shrinking edge relation, checkpoint-released per round (CC discipline, loud past maxIter). By plan time consumers scan the pinned materialization (`Scan ExistingRDD`) — re-reads never replay rounds. The oracle unrolls 8 MATERIALIZED rounds (plain CTEs would re-inline 3^rounds times); extra rounds past convergence are idempotent.",
    "benford_first_digit" ->
      "Forensic first-digit audit: one digit-grouped count aggregate + a 1-row total carrier; expected permilles are integer literals (no runtime log10, no float surface). On this corpus it genuinely flags the uniform synthetic price digits — the test detecting exactly what it is built to detect.",
    "assoc_rules_lift" ->
      "A-priori level-2 without quadratic blowup: baskets collapse to distinct (order,item) first, the pair expansion is an equi-join on the order key bounded by the basket-size cap (mega-baskets filtered out — the one key that could expand 10^10 pairs), and item totals plus the 1-row basket count attach to the surviving rules by broadcast. Confidence/lift are integer permilles via BIGINT div — no float crosses an exchange.",
    "event_transition_matrix" ->
      "Markov matrix in one user-keyed window pass: lag() pairs each event with its successor inside the trajectory partition, the count collapses to |types|² rows, and the row-conditional permille divides at matrix cardinality. The naive successor-by-timestamp self-join is quadratic under ties and shuffles twice; this shuffles once.",
    "session_path_topk" ->
      "Path mining with the truncation BEFORE the aggregation: sessionize + per-session rank share one user-keyed Window chain (no second exchange), rn≤maxLen drops the tail of long sessions before any string is built, and the path table the top-k scans is ≤|types|^maxLen rows served by TakeOrderedAndProject.",
    "concurrent_sessions_peak" ->
      "Interval max-overlap with NO global sweep: sessions explode into their (≤48, capped) covered hours, each hour's carry-in is a pure aggregation over that span relation, and the ±1 boundary sweep windows are hour-keyed partitions over boundary events only. The textbook formulation orders every boundary in the corpus in one reducer; this shape's widest sort is one hour.",
    "mad_outlier_days" ->
      "Hampel filter at day cardinality: the corpus pays one partial/final cents reduction, both exact medians run over the ~2.4k-row daily relation, and med2/mad2 ride 1-row broadcast carriers. Doubled-integer medians keep the half-step interpolation exact; the 3·1.4826·MAD test is integer cross-multiplication (10000·dev2 > 44478·mad2).",
    "containment_dup_pairs" ->
      "Asymmetric containment dedup (Broder's resemblance-vs-containment): the same hash-shingle candidate discipline as the Jaccard family — 8-byte gram hashes end-to-end, df cap kills boilerplate grams before the gh-keyed pair join — but normalized by the contained side, so a short doc quoted inside a long one (invisible to Jaccard/MinHash) scores 1000‰. One intersect count serves both directions; the ratio is integer permille.",
    "editdist_similar_names" ->
      "Record-linkage string matching without all-pairs: the corpus collapses to DISTINCT values first (vocabulary-scale), candidates come from a token-blocking equi-join with a hot-token df cap (a stopword block would recreate the quadratic join), and the O(len²) levenshtein verify is a post-join FILTER on blocked candidates only — never a join condition, which would force a nested loop.",
    "cdc_snapshot_asof" ->
      "Point-in-time reconstruction from a multi-generation change log: the ts≤T filter prunes the log BELOW the key-keyed exchange (only the live prefix shuffles), one rank window per key resolves latest-change-wins, and delete suppression is a post-rank filter. No join against any 'current' table — the log alone carries the state.",
    "timeseries_gapfill_locf" ->
      "Gap-fill + LOCF with the corpus paying only a day-cardinality reduction: daily totals partial/final-aggregate first, the calendar spine generates off a 1-row min/max carrier, and the carry-forward window runs over spine cardinality. The naive per-day correlated 'latest prior observation' subquery is quadratic in days; this is one window.",
    "histogram_quantile_range" ->
      "Mergeable quantile sketch store (the HLL-store pattern for ranks): the corpus pays ONE (month,bin) aggregation, bins merge across any month range by pure addition, and the quantile probe is a bin-cardinality cumulative window + a 3-row broadcast permille probe — range queries never rescan the corpus, and rank error is bounded by one bin width.",
    "k_anonymity_audit" ->
      "Privacy screen in one pass: QI-class size (k) and sensitive-band diversity (l) come from a single grouped aggregate with map-side partials; the class relation is QI-cardinality. No self-join against the class list — the flags are projections over the same aggregate row.",
    "embedding_gram_upper" ->
      "Distributed Gram matrix (the PCA/whitening building block): each vector generates its 2080 upper-triangle products inside a codegen'd explode — no self-join of the dimension explode (the naive posexplode⋈posexplode doubles the shuffle and adds a join) — and the (i,j)-keyed aggregation combines map-side, so the exchange carries ≤2080 rows per task at ANY corpus size. Exact BIGINT quantized products.",
    "cdc_join_maintain" ->
      "Incremental maintenance of a JOIN view (ΔA⋈B with an immutable dimension — the common warehouse case of the textbook join-delta decomposition): the change feed's ± terms join the customer dimension by BROADCAST (the dimension never re-shuffles for a refresh), merge with the stored (nation,status) rollup by pure addition, and the refresh pays |changes| with no fact rescan beyond the initial view build. The oracle recomputes from the fully merged table across the join — maintenance ≡ recompute, including cross-group moves.",
    "sql_lateral_topk" ->
      "SQL-2016 LATERAL with ORDER BY+LIMIT, decorrelated: Catalyst rewrites the per-segment correlated top-2 into a DomainJoin-derived rank window over the joined fact stream — one plan for all driving rows, never a re-execution per segment (the nested-loop reading of LATERAL). The pin asserts Window present, CartesianProduct absent.",
    "corr_moments_lineitem" ->
      "Pearson-matrix moments in ONE pass: all nine pairwise sums (Σx, Σx², Σxy for 3 columns) land in a single partial/final aggregate over a single scan — no per-pair scans, no Expand (no distincts). Scales picked BIGINT-overflow-safe through sf100 (price in whole units, discount in permyriad); the float division is the consumer's, so the gate stays exact.",
    "funnel_time_bound" ->
      "Deadline conversion without the view×purchase self-join: first_view attaches via one whole-partition window over the user-keyed stream, the deadline test is a projection, and the conversion metric collapses in one distinct-aggregate. The naive formulation joins purchases to views per user and double-shuffles.",
    "er_name_clusters" ->
      "The full entity-resolution pipeline (block → verify → cluster) in one plan: df-capped token blocking, Levenshtein verify as a post-join filter, then the audited CC loop — by plan time converged and pinned as a materialization (`Scan ExistingRDD`), so consumers never replay the iterations. Name→id is a rank over the DISTINCT vocabulary (corpus-independent single partition); the min-id label maps back to the min name.",
    "code_detect_score" ->
      "Code-vs-prose screen as a PURE projection: symbol density via length-diff (no explode), indent/keyword/identifier counts via lazy array filters inside codegen, integer-permille score by BIGINT div. Zero exchanges (the only repartition is the skew fan-out) — at 100 TB this runs entirely map-side, the cheapest possible shape for a per-document filter.",
    "seasonal_naive_backtest" ->
      "Forecast backtesting at day cardinality: the corpus pays one partial/final cents reduction, the lag-7 seasonal-naive forecast is a window over the ~2.4k-row daily relation, and the per-weekday MAE rollup is 7 rows. Exact integer cents end-to-end — the baseline every forecasting pipeline must beat, measured without a single float.",
    "ab_test_chi2" ->
      "Experimentation readout with an exact significance decision: the event stream collapses to one (user, variant, converted) row (user_id is the only wide exchange key), the 2×2 contingency table is a single aggregate row, and the χ²≥3.841 test runs as cross-multiplication in DECIMAL(38,0) — 1000·n·(ad−bc)² vs 3841·∏margins, no division, no sqrt, overflow-safe through ~10⁹ users, bit-identical verdict in both engines.",
    "graph_bfs_depth" ->
      "Bounded-depth BFS (Pregel/Bellman-Ford shape): each unrolled round is one src-keyed join of the |nodes|-sized distance table against the ONCE-materialized edge relation plus a per-dst min aggregate (map-side combined). The edge pin means round k never re-derives the pair expansion; the bounded horizon is what makes an exactly-replayable oracle possible.",
    "graph_lpa_communities" ->
      "Deterministic synchronous label propagation (communities, NOT connectivity — the majority vote finds denser structure than CC's min-label): per round one src-keyed label join, a map-side-combined (dst,label) vote count, and a dst-keyed rank window over ≤degree rows with a min-label tie-break (fully deterministic, both engines bit-agree). Rounds checkpoint-release (CC discipline), so the plan roots in the previous round's materialization.",
    "luhn_pii_scan" ->
      "Checksum-validated PII detection as a PURE projection: candidates from one regexp_extract_all, the Luhn sum as a lazy higher-order aggregate over each digit string (codegen'd — no explode, the candidate array never widens the row count), zero exchanges. The checksum rejects ~90% of random 16-digit false positives that a regex-only scrub would flag; precision costs nothing at 100 TB because the whole query is map-side.",
    "window_rank_suite" ->
      "Rank-function surface (dense_rank/percent_rank/cume_dist/nth_value) at DAY cardinality: the corpus reduces to daily totals first, one compound-key ordering serves the three rank functions in a single Window node (nth_value's unbounded-following frame adds one more), and the rationals are exact small fractions — deterministic as doubles in both engines.",
    "rolling_7d_active_users" ->
      "The sliding-window distinct problem solved by sketch store: exact COUNT(DISTINCT) cannot window, so per-day HLL sketches are stored once (one partial/final pass over distinct user-days) and each day's trailing week is a RANGE-frame hll_union_agg over SEVEN STORED SKETCHES — zero row re-touch per window position. The exact twin (each user-day spread to its 7 target days, distinct, per-day count) gates the estimate at ±5%; at 100 TB only the sketch path runs.",
    "bot_regularity_flags" ->
      "Traffic-quality screen in one trajectory pass: inter-event gaps from the family's single user-keyed lag window, exact gap moments accumulated in DECIMAL(38,0) (a month of ms-gaps squared overflows BIGINT at depth), and the low-variance bot test by cross-multiplication — n·Σg² − (Σg)² < τ²·n·(n−1) decides sample-variance < τ² with no division. Sparse users are unflagged, not guessed.",
    "user_diversity_simpson" ->
      "Engagement diversity without logs: Simpson's 1 − Σp² is an exact rational (entropy would force floats), so the per-user index is pure BIGINT arithmetic over a (user,type) count and the output is a bucket histogram at user cardinality. Two aggregates, one exchange family, no window over the stream.",
    "cross_source_dups" ->
      "Syndication/mirror detection: md5 of the 60-char head fingerprint (byte-identical md5 misses mirrors whose bodies diverge after the lede) grouped once, with the distinct-source count and the cross-source HAVING pruning inside the aggregation — nothing but confirmed mirrors leaves the operator.",
    "observe_metrics_audit" ->
      "The Observation API as the zero-cost audit surface: named metrics (input count, selectivity counter) ride the SAME job as the filter stage they audit — at 100 TB a separate audit query would double the scan; observe() adds a per-task accumulator. The output relation is the one-row driver-side metric record, cross-checked by the gate against an independent SQL recompute.",
    "revenue_drawdown" ->
      "Max drawdown in the CUSUM closed-window discipline: daily reduction first, running sum + running max at DAY cardinality, worst trough via TakeOrderedAndProject top-1 with a deterministic earliest-day tie-break. Integer cents; no self-join against 'all prior peaks' (the naive quadratic formulation).",
    "session_bounce_rate" ->
      "Bounce KPI riding the session family's ONE user-keyed window pass: the gap-sessionize relation already exists in the plan; the bounce rollup adds a single global aggregate and an integer-permille division. Nothing touches the stream twice.",
    "funnel_three_step" ->
      "Strict ordered funnel without the 3-way inequality self-join: each stage is a user-keyed aggregate whose threshold is the previous stage's timestamp, chained by co-partitioned joins — user_id is the ONLY exchange key in the plan, and the inequality lives in a post-join filter, never a join condition. The naive event³ self-join is quadratic per user and defeats pushdown.",
    "key_skew_report" ->
      "The pre-flight skew diagnostic: per-key counts in one map-side-combined pass, hot keys by TakeOrderedAndProject, totals + the HHI concentration index (Σc²·10⁶/n², the exact-rational Herfindahl measure) on a 1-row broadcast carrier. This is the query that decides salting/AQE-skew/broadcast BEFORE a 100 TB join runs — it must itself cost one aggregation, and does.",
    "events_kpi_snapshot" ->
      "The composed dashboard query (the curated_corpus precedent on the events side): bounce, peak-concurrency, strict funnel, and hourly anomaly each keep their audited plan shape — the stream pays each family's single wide exchange (user_id for sessions/funnel, hour_no for the sweep) — and the four 1-row results fuse by broadcast carriers. Cost = sum of the audited parts; nothing multiplicative.",
    "revenue_gini" ->
      "Inequality measurement linearized: Gini's definitional mean-absolute-pairwise-difference is O(n²); the sorted form Σ(2i−n−1)xᵢ/(n·Σx) costs one rank window at DAY cardinality after the daily reduction. Numerator/denominator surface as exact BIGINTs, the coefficient as integer permille — no float, no pairwise join.",
    "langid_confusion" ->
      "Classifier evaluation in one pass: the language guess is a pure projection beside the truth label (no guess⋈truth self-join — the naive eval joins two derived tables on doc_id and shuffles twice), the matrix collapses to ≤|langs|² rows, and per-class recall divides at matrix cardinality as integer permille.",
    "conversion_latency_hist" ->
      "Time-to-convert distribution in the funnel discipline: first-view per user, first subsequent purchase per user (inequality as a post-join filter on the co-partitioned join — never a join condition), then an hour-bucket rollup at histogram cardinality. user_id is the only wide exchange key.",
    "pareto_revenue_concentration" ->
      "80/20 analysis without a customer-cardinality sort: per-customer revenue collapses into value buckets (the lang_adaptive_cut histogram discipline), the descending cumulative windows run at BUCKET cardinality, and the crossing test cross-multiplies (5·cum ≥ 4·total). Resolution = one bucket width — the knob — instead of a single-task rank over every customer at 100 TB.",
    "contrastive_triplets" ->
      "Training-triplet mining on top of the audited MinHash band path: positives are the banded candidate pairs (never all-pairs), and the deterministic md5-keyed negative is a pure projection — the only addition to the pair plan is the 1-row n_docs broadcast carrier.",
    "winnow_fingerprint_stats" ->
      "Winnowing (MOSS) fingerprints with extraction AND selection inside the map stage: the `Generate rollinghashgenerator` codegen node emits only the ~2/(w+1) winnow-selected minority — the O(n) rolling pass, the ring-buffer min-deque, and the discarded majority never exist as rows, so the first exchange carries fingerprints, not windows. Per-doc stats are one partial+final aggregate on doc_id.",
    "winnow_dup_pairs" ->
      "The deterministic-recall exact-substring pair join: distinct (doc, fingerprint) feeds a df-capped equi-join on the 62-bit fingerprint value (the MinHash-band discipline — a boilerplate fingerprint shared by 10^6 docs is dropped, never expanded into 10^12 pairs). Every exchange keys on the fingerprint; no similarity computation happens outside the capped candidate set.",
    "percentile_exact_twopass" ->
      "Exact percentiles with bounded state: phase 1 aggregates (group, cents DIV 2^16) — the corpus collapses to <=~763 buckets per group before any window runs — and phase 2 re-scans only candidate buckets via a broadcast semi-join, grouping by exact value WITHIN one bucket (<=2^16 distinct values). Neither pass buffers a group's value set, unlike the exact `percentile` aggregate; the rank arithmetic is pure integer.",
    "fs_linkage_scores" ->
      "Fellegi-Sunter scoring as pure dataflow: three single-row u-statistic carriers (decimal-lane sums of squared counts) broadcast into the block equi-join, per-field likelihood ratios in BIGINT permyriad lanes, and the match gate as exact integer cross-multiplication (num >= T*den) — no float decides a row, and the only corpus-scale exchange is the block-key join itself.",
    "blocklist_match_stats" ->
      "Aho-Corasick dictionary scan: one `Generate ahocorasickgenerator` codegen pass per document emits every overlapping occurrence — O(text+matches) regardless of dictionary size, where a per-pattern contains loop pays O(text*patterns). The automaton compiles once per executor (cached by pattern-set key, rides the closure); per-doc stats are one partial+final aggregate and the left join back to documents keeps zero-hit docs.",
    "topk_agg_orders" ->
      "Per-group top-N without a window sort: `ObjectHashAggregate` over the bounded-heap topk_pairs aggregate — per-(group,partition) state is k pairs, partials combine map-side, and the exchange carries <=k rows per group per partition instead of the group's full row set (the window-rank twin sorts a hot group's entire history in one task). No Window or corpus-scale Sort node in the plan.",
    "dbscan_clusters" ->
      "Grid-blocked density clustering: candidate neighbors come from a 3x3 adjacent-cell equi-join on the eps-width grid of the 2-D integer projection (complete by construction in 2-D; each pair matches exactly one offset, so no distinct) — never an all-pairs distance join. The CC labeling is materialized through the audited checkpoint-released loop before this final assembly plan, which only left-joins |points|-sized label relations.",
    "wordpiece_stats" ->
      "WordPiece inference in the map stage: explode words, then the `Generate wordpiecegenerator` codegen node walks the per-executor-cached trie — greedy longest-match backtracking per position, O(word x max_piece_len), no join against a vocabulary relation anywhere. Downstream is one doc-keyed partial+final aggregate and the zero-piece left join.",
    "maxcover_select" ->
      "The greedy coverage loop's per-round plan (this is round k's assembly; earlier rounds materialized through checkpoint-released covered sets): a gram-keyed LeftAnti against the covered relation, then a doc-keyed count whose one-row argmax is a TakeOrderedAndProject — the corpus-scale shingle relation is checkpointed once and re-joined per round, the BPE-loop discipline.",
    "maxcover_select_lazy" ->
      "The CELF twin's final assembly (the trajectory relation itself is driver-composed from bounded pops): the ONLY corpus-scale aggregate of the whole selection is the round-1 per-doc gain count this plan shows — every later step is a TakeOrdered(2) over the doc-scale bounds relation plus a ONE-document anti-join probe, so the selection budget k multiplies doc-local work, never corpus rounds (the r13 watch item).",
    "unigram_tokenize_stats" ->
      "Unigram-LM apply: every EM round and the final tokenize run on the DISTINCT-WORD relation — substring Generate, a BroadcastHashJoin against the scored piece vocabulary, one (w,c) map regroup, and the Viterbi DP + backwalk as codegen'd aggregate folds in the projection (no Window, no per-position join). The corpus-scale work is exactly two equi-joins: the histogram groupBy and the final word-keyed stats join.",
    "winnow_incremental_pairs" ->
      "Snapshot ingestion for the winnowing index: only the incoming batch runs the rolling-hash Generate (the existing corpus arrives as its persisted (doc,h) index), and the union feeds the SAME single fingerprint-keyed repartition as the batch plan — dedup, hot-cap window, and both self-join sides all partition-local on one reused exchange.",
    "ann_recall_curve" ->
      "Recall calibration without repeated corpus passes: ONE trained-centroid broadcast assignment of the corpus (crn = 1) and ONE of the queries at max(nprobe), sliced per curve point by a crn filter; the multi-probe points share one bucketed corpus relation. Truth is the same broadcast crossJoin + WindowGroupLimit as ann_brute_topk; the curve itself aggregates at settings cardinality.",
    "mixture_doremi_weights" ->
      "DoReMi multiplicative-weights reweighting: the corpus pays ONE (lang, chars, tokens) map-side-combined aggregation; all 5 update rounds are window ops over that |domains|-row relation on a single driver-sized partition (the plan's one `Exchange SinglePartition` is |langs| rows by construction) — round count never multiplies corpus passes. All update arithmetic is sign-ruled integer ppm, so the unrolled DuckDB CTE chain agrees bit-for-bit.",
    "t_closeness_audit" ->
      "Distribution-level privacy audit: the table collapses to (QI, band) counts in one pass; the class×value completion (absent bands still contribute) is a broadcast cross of the ≤|bands|-row value relation against the |classes|-row class relation — corpus-independent cardinality — and the TV numerator lane runs in DECIMAL(38,0) with ONE late division per class (no per-band truncation accumulation, Spark div ≡ DuckDB // on the nonnegative lane).",
    "graph_hits_authorities" ->
      "HITS over the bipartite purchase graph — the pagerank loop discipline with TWO edge layouts: the edge relation is declared-partition-checkpointed on c AND on p (`PartitionedCheckpoint.localEagerDeclared`), so the authority step's c-keyed join and the hub step's p-keyed join are each co-partitioned with their layout and the corpus-scale relation crosses the wire a constant number of times (expansion + two repartitions), independent of round count. Per round only node-sized rank tables and map-side partial sums move; normalization totals are 1-row DECIMAL(38,0) broadcast carriers, and each round's a/h tables are pinned with the previous generation released (the Lloyd-loop discipline) — the total shares the raw-score subtree, so an unpinned unroll re-executes every prior round's joins exponentially (26.4→5.3s at sf0.1 for 3 rounds once pinned; 30× probe 1.4×). The returned frame is the post-loop checkpoint scan (kmeans_step discipline) cut by TakeOrderedAndProject.",
    "filter_agreement_kappa" ->
      "Filter-consolidation audit: both flags are per-row projections, so the corpus collapses to the 2×2 confusion in ONE map-side-combined aggregate (the plan's only exchange is the single-partition final merge of 5-value partials) and the kappa cross-multiplication is a 1-row projection in the DECIMAL(38,0) lane. Zero joins, zero corpus-scale wide work — the cheapest possible audit of whether two gates are redundant.",
    "embedding_silhouette" ->
      "Cluster-quality audit at O(N·L): the (label, dim) centroid aggregate collapses the corpus map-side; the ≤|labels|-row centroid-array relation broadcasts into the corpus cross (L rows per vector, a map-stage fan-out scored by the codegen'd dot_i64 identity d² = |x|² − 2x·c + |c|²); the nearest-other min and the per-label mean are vec- and label-keyed aggregates. Exact silhouette's O(N²) pairwise half is replaced by the centroid formulation — the only one that scales — and every lane is exact integer ppm.",
    "perceptron_reliability" ->
      "Score-calibration curve: the learned weights ride as a literal broadcast array, the margin is a codegen'd per-row fold (no join), and the corpus collapses to sign-ruled score bins in ONE map-side-combined aggregate — bin cardinality output, the quality_threshold_sweep shape applied to a learned model's margins.",
    "stl_decompose_daily" ->
      "STL-lite decomposition: orders collapse to |days| rows in one map-side-combined aggregation; the centered 7-day trend is a value-RANGE window at day cardinality, the weekly seasonal collapses to 7 weekday rows (its recentering window runs over those 7), and the seasonal attaches back by broadcast — every division is sign-ruled truncating div, so the decomposition is bit-identical in DuckDB. The residual lane is what mad_outlier_days should consume at scale — anomaly detection after seasonality removal.",
    "markov_attribution" ->
      "Data-driven attribution: ONE user-keyed window pass (purchase-truncation prefix count + lag chain + last-event rank share the same partitioning) collapses the stream to the ≤(|types|+1)² transition matrix; the driver collects that bounded relation (type-vocabulary cardinality — the audited bounded-collect discipline) and replays the 8-step ppm power iteration per removal variant in exact Long arithmetic. Fixed-horizon absorption instead of matrix inversion keeps the arithmetic integer-portable; the unrolled DuckDB oracle replays the identical 5 variant chains.",
    "pack_fragmentation_report" ->
      "Packing QA: runs on the decomposed packing relation (pack_sequences_scalable's bucketed offsets — no per-language window straggler), so the straddle test is a per-row projection ((cum + n − 1) div budget ≠ bin) and the report is one lang-keyed rollup at language cardinality. The metric that decides the packing budget: every straddling doc is a split training sequence.",
    "dedup_savings_by_source" ->
      "Dedup capacity planning: ONE (source, md5) aggregation (map-side combined — content groups collapse before the exchange), then a source-cardinality rollup; duplicate bytes are (count−1)·size per group so the keeper is never counted. No joins, nothing corpus-quadratic — the report costs one pass.",
    "source_token_entropy" ->
      "Vocabulary-diversity corpus health: the token stream collapses to (source, token) counts in the first map-side-combined aggregate — the dsir/bm25 vocabulary shape — and the entropy fold (c·qlog2(c) in the DECIMAL(38,0) lane) runs inside the source-cardinality rollup. The fixed-point qlog2 (the Unigram lane, 256 ≡ one bit) is what lets an entropy be oracle-gated at all — a float log2 sum drifts a ulp per term across engines.",
    "ab_cuped_readout" ->
      "Variance-reduced experimentation: the stream collapses to per-user (x, y) in ONE user-keyed aggregate (the midpoint cut is a 1-row broadcast carrier, so pre/post splitting is a projection, not a second scan); pooled moments and per-arm sums are single-row/2-row aggregates over the user relation, joined back by broadcast. θ quantizes once to sign-ruled ppm so no compounding rational denominators ever form — the DECIMAL(38,0) moment lanes are the only wide arithmetic.",
    "theilsen_revenue_trend" ->
      "Theil–Sen robust trend: orders collapse to |days| rows first, so the pairwise-slope expansion is CALENDAR-bounded (|days|²/2), never corpus-bounded, and the non-equi self-join is a broadcast nested-loop over the tiny daily relation — the one place BNLJ is the RIGHT plan. It runs ONCE: the slope relation is pinned (|days|²/2 longs), and both median phases read the checkpoint (the dump's ExistingRDD leaves; unpinned, histogram + bucket re-scan each re-ran the expansion — 13.0→6.1s at sf0.1). The median is the ExactQuantile two-phase selection: a 2²⁰-micro-wide histogram locates the rank-k bucket (single-partition windows only at BUCKET cardinality), and the re-scan confined to that bucket picks the exact quantized slope — no |days|²-row single-partition sort. 30× probe: 1.4× wall (days don't scale with corpus).",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byName = Registry.all.map(q => q.name -> q).toMap
    val sb = new StringBuilder
    sb ++= "# PLANS — physical plan audit\n\n"
    sb ++= s"Generated by `graft.Plans` over `$sfDir`. Each section states the\n"
    sb ++= "property the plan must exhibit at scale, then the formatted plan\n"
    sb ++= "(pre-execution, so AQE nodes show as `AdaptiveSparkPlan isFinalPlan=false`).\n"
    audited.foreach { case (name, note) =>
      val df = byName(name).fn(spark, sfDir)
      val out = new ByteArrayOutputStream()
      Console.withOut(out) { df.explain("formatted") }
      sb ++= s"\n## $name\n\n$note\n\n```\n${out.toString(StandardCharsets.UTF_8).trim}\n```\n"
    }
    Files.write(Paths.get("PLANS.md"), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote PLANS.md (${audited.size} plans)")
    spark.stop()
  }
}
