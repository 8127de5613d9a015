package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Checkpoints, EngineQuery, Tables}

/** Unigram-LM subword tokenizer learning (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram algorithm): seed a piece
  * inventory from frequent substrings, then alternate (E) Viterbi-best
  * segmentation of the word histogram under current piece
  * probabilities with (M) re-estimating piece counts from those
  * segmentations, pruning pieces that stop being used. Completes the
  * engine's tokenizer-family triad: BPE learns merges bottom-up
  * ([[Bpe]]), WordPiece applies a fixed vocab greedily ([[WordPiece]]),
  * unigram-LM learns a vocabulary top-down by likelihood.
  *
  * Deviations from the reference algorithm, chosen so the WHOLE
  * iterative computation is exact-integer and hash-checkable across
  * engines (the [[graft.dedup.FellegiSunter]] rule: quantization is
  * part of the operator definition):
  *  - hard-EM (Viterbi counts) instead of full forward–backward
  *    expectations — the standard deterministic approximation;
  *  - piece log-probabilities are FIXED-POINT base-2 logs,
  *    qlog2(c) = the exact integer the shift-square fold below
  *    computes (≈ floor(256·log2 c), 8 fractional bits): piece score
  *    = qlog2(cnt) − qlog2(total). A float ln() would inherit the
  *    1-ulp engine gap PER PIECE PER POSITION ([[BigramLm]] doc); the
  *    fold is ~30 integer ops on BIGINT lanes (inputs < 2^43), so both
  *    engines compute the IDENTICAL integer;
  *  - frequency pruning (seed multis that drop to zero Viterbi count
  *    leave the vocabulary) instead of loss-based pruning.
  *
  * Scale shape (100 TB): the corpus pays ONE tokenize pass (the word
  * histogram — the [[Bpe]] discipline); every EM round runs on the
  * DISTINCT-WORD relation weighted by count: substring explode (≤ 4·|w|
  * rows per word), a piece-keyed equi-join against the (small,
  * broadcastable) scored vocabulary, a per-word map regroup, and the
  * Viterbi DP + backwalk as ONE codegen'd fold per word — no shuffle
  * beyond the vocab-scale groupBys, no driver state beyond the round
  * counter (counts, totals, and scores all stay distributed).
  *
  * The DuckDB oracle replays every stage structurally independently:
  * the same qlog2 as a `list_reduce` fold, the Viterbi DP as a linear
  * recursive CTE carrying the best/backpointer lists, the backwalk as
  * a second recursion — unrolled per EM round like the [[Bpe]] learner
  * oracle, so tie-breaks, pruning, and the final model hash-match
  * end-to-end.
  */
object Unigram {

  /** Max piece length (chars). */
  val MaxPiece = 4

  /** Multi-char seed pieces kept (top by occurrence count, ties to the
    * lexicographically smaller piece); single chars are always kept.
    */
  val SeedMulti = 40

  /** Hard-EM rounds. */
  val Rounds = 2

  // ---- exact fixed-point log2 ----------------------------------------
  // qlog2(c) = b·2^8 + frac, b = floor(log2 c) via bit length, frac from
  // 8 shift-square steps on a 20-guard-bit mantissa x ∈ [2^20, 2^21):
  // square, renormalize (shift out one bit → frac bit 1), truncate back
  // to 20 bits. Packing a = x·512 + fracbits keeps the whole fold one
  // BIGINT lane (x² ≤ 2^44). Valid for 1 ≤ c < 2^43.

  private[text] def sparkQlog2(c: String): String =
    s"""(CAST(length(bin($c)) - 1 AS BIGINT) * 256 +
       | aggregate(sequence(1, 8),
       |   ((($c) * CAST(1048576 AS BIGINT)) div shiftleft(CAST(1 AS BIGINT), length(bin($c)) - 1)) * 512,
       |   (a, i) -> CASE WHEN ((a div 512) * (a div 512)) div 1048576 >= 2097152
       |     THEN ((((a div 512) * (a div 512)) div 1048576) div 2) * 512 + (a % 512) * 2 + 1
       |     ELSE (((a div 512) * (a div 512)) div 1048576) * 512 + (a % 512) * 2 END
       | ) % 512)""".stripMargin

  private[text] def duckQlog2(c: String): String =
    s"""(CAST(length(bin($c)) - 1 AS BIGINT) * 256 +
       | list_reduce(
       |   list_prepend(((($c) * 1048576) // (CAST(1 AS BIGINT) << (length(bin($c)) - 1))) * 512,
       |                list_transform(range(8), i -> CAST(0 AS BIGINT))),
       |   (a, x) -> CASE WHEN ((a // 512) * (a // 512)) // 1048576 >= 2097152
       |     THEN ((((a // 512) * (a // 512)) // 1048576) // 2) * 512 + (a % 512) * 2 + 1
       |     ELSE (((a // 512) * (a // 512)) // 1048576) * 512 + (a % 512) * 2 END
       | ) % 512)""".stripMargin

  /** JVM reference of the same fold — `UnigramSpec`'s differential
    * oracle for the SQL expression.
    */
  private[graft] def qlog2Ref(c: Long): Long = {
    require(c >= 1 && c < (1L << 43), s"qlog2 domain: $c")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(c)
    var x = (c * 1048576L) / (1L << b)
    var bits = 0L
    for (_ <- 1 to 8) {
      val y = (x * x) / 1048576L
      if (y >= 2097152L) { bits = bits * 2 + 1; x = y / 2 }
      else { bits = bits * 2; x = y }
    }
    b.toLong * 256 + bits
  }

  // ---- engine pipeline ------------------------------------------------

  /** All substrings of each histogram word, one row per occurrence:
    * (w, c, pos, len, piece), len 1..MaxPiece, pos 1-based.
    */
  private def subPieces(wc: DataFrame): DataFrame =
    wc.select(col("w"), col("c"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), pos ->
           |  transform(sequence(1, least($MaxPiece, length(w) - pos + 1)),
           |    len -> named_struct('pos', pos, 'len', len))))""".stripMargin)).as("s"))
      .select(col("w"), col("c"),
        col("s.pos").as("pos"), col("s.len").as("len"),
        expr("substring(w, s.pos, s.len)").as("piece"))

  /** (piece, score) under the current (piece, cnt) vocabulary:
    * score = qlog2(cnt) − qlog2(Σcnt), exact integers.
    */
  private def withScores(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"),
        expr(s"${sparkQlog2("cnt")} - ${sparkQlog2("tot")}").as("score"))
  }

  /** Viterbi DP backpointers as one fold per word: best[j] maximizes
    * Σ scores over segmentations of the first j chars; candidates are
    * the ≤ MaxPiece pieces ending at j that exist in the score map,
    * evaluated p = 1..MaxPiece with strict >, so score ties go to the
    * SHORTEST candidate — the oracle replays the identical chain.
    * Single chars are always in the vocabulary, so best[j] is total.
    */
  private val dpExpr: String = {
    def vp(p: Int) =
      s"(element_at(acc.best, j - $p + 1) + try_element_at(m, (j - $p + 1) * 8 + $p))"
    var chain = s"named_struct('v', ${vp(1)}, 'p', 1)"
    for (p <- 2 to MaxPiece)
      chain =
        s"""IF(j >= $p AND ${vp(p)} IS NOT NULL AND ${vp(p)} > ($chain).v,
           |named_struct('v', ${vp(p)}, 'p', $p), $chain)""".stripMargin
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('best', array(CAST(0 AS BIGINT)), 'bp', CAST(array() AS ARRAY<INT>)),
       |  (acc, j) -> named_struct(
       |    'best', concat(acc.best, array(($chain).v)),
       |    'bp', concat(acc.bp, array(($chain).p))),
       |  acc -> acc.bp)""".stripMargin
  }

  /** Backpointer walk (length(w) is an upper bound on steps; the fold
    * idles once j hits 0): emits the chosen pieces, end to start.
    */
  private val backwalkExpr: String =
    """aggregate(sequence(1, length(w)),
      |  named_struct('j', length(w), 'ps', CAST(array() AS ARRAY<STRING>)),
      |  (acc, i) -> IF(acc.j <= 0, acc, named_struct(
      |    'j', acc.j - element_at(bp, acc.j),
      |    'ps', concat(acc.ps, array(substring(w, acc.j - element_at(bp, acc.j) + 1, element_at(bp, acc.j)))))),
      |  acc -> acc.ps)""".stripMargin

  /** Viterbi-segment every histogram word under `scores`:
    * (w, c, pieces).
    */
  private def segmented(allSubs: DataFrame, scores: DataFrame): DataFrame =
    allSubs.join(broadcast(scores), Seq("piece"))
      .groupBy("w", "c")
      .agg(map_from_entries(collect_list(
        struct((col("pos") * 8 + col("len")).as("k"), col("score").as("v")))).as("m"))
      .withColumn("bp", expr(dpExpr))
      .withColumn("pieces", expr(backwalkExpr))
      .select("w", "c", "pieces")

  /** The shared learner: seed → `Rounds` hard-EM rounds. Returns the
    * final (piece, cnt) vocabulary, the substring relation (for the
    * tokenize pass), and a release handle for both checkpoints.
    */
  private def learn(docs: DataFrame): (DataFrame, DataFrame, () => Unit) = {
    val wc = Bpe.wordCounts(docs)
    val (allSubs, freeSubs) = Checkpoints.localEager(subPieces(wc))
    // Seed selection in ONE checkpointed job (chars + top-SeedMulti
    // multis used to be three separate eager materializations — the
    // per-job overhead tripled the learner's fixed cost): the rank
    // window partitions on the char/multi split, so "rk <= SeedMulti
    // within multis" is exactly the old orderBy-limit pick, and the
    // round-0 vocabulary plus both per-round views (char floor, multi
    // prune) filter this single pinned relation.
    val (seedK, freeSeed) = Checkpoints.localEager(
      allSubs.groupBy("piece").agg(sum(col("c")).as("cnt"))
        .withColumn("is_char", length(col("piece")) === 1)
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("is_char")).orderBy(col("cnt").desc, col("piece"))))
        .where(col("is_char") || col("rk") <= SeedMulti)
        .select("piece", "cnt", "is_char"))
    val chars0 = seedK.where(col("is_char")).select("piece", "cnt")
    val multi0 = seedK.where(!col("is_char")).select("piece", "cnt")
    var vocab: DataFrame = seedK.select("piece", "cnt")
    var freeV: () => Unit = () => () // round-0 vocab rides the seed checkpoint
    for (_ <- 1 to Rounds) {
      val counts = segmented(allSubs, withScores(vocab))
        .select(explode(col("pieces")).as("piece"), col("c"))
        .groupBy("piece").agg(sum(col("c")).as("cnt"))
      // chars are required pieces (floor 1 keeps them scoreable); seed
      // multis that fell out of every Viterbi path are pruned for good
      val next =
        chars0.select("piece").join(counts, Seq("piece"), "left_outer")
          .select(col("piece"),
            greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
          .union(
            multi0.select("piece").join(counts, Seq("piece"))
              .where(col("cnt") > 0).select(col("piece"), col("cnt")))
      val (v2, freeV2) = Checkpoints.localEager(next)
      freeV(); vocab = v2; freeV = freeV2
    }
    val release = () => { freeSubs(); freeSeed(); freeV() }
    (vocab, allSubs, release)
  }

  /** The learned model: (piece, n_chars, cnt, qscore) — final expected
    * counts and fixed-point log-prob scores, most frequent first.
    */
  def unigramLearn(docs: DataFrame): DataFrame = {
    val (vocab, _, release) = learn(docs)
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    val out = vocab.crossJoin(broadcast(tot))
      .select(
        col("piece"),
        length(col("piece")).cast("long").as("n_chars"),
        col("cnt"),
        expr(s"${sparkQlog2("cnt")} - ${sparkQlog2("tot")}").as("qscore"))
      .orderBy(col("cnt").desc, col("piece"))
      .localCheckpoint(true)
    release()
    out
  }

  /** Tokenize the corpus under the final model: (doc_id, n_tokens,
    * n_words) — per-word Viterbi piece counts from the vocabulary-scale
    * DP, equi-joined to the corpus word stream (hash-partitions on the
    * word at scale; the model side broadcasts), one partial+final
    * rollup per document.
    */
  def unigramTokenizeStats(docs: DataFrame): DataFrame = {
    val (vocab, allSubs, release) = learn(docs)
    val nPieces = segmented(allSubs, withScores(vocab))
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
      .localCheckpoint(true)
    release()
    Bpe.docWords(docs)
      .join(nPieces, Seq("w"))
      .groupBy("doc_id")
      .agg(sum(col("n_pieces")).as("n_tokens"), count(lit(1)).as("n_words"))
  }

  /** Per-language unigram fertility (pieces per word — the
    * tokenizer-equity rollup, [[Bpe.bpeFertilityByLang]]'s twin for
    * this family): same plan as [[unigramTokenizeStats]] with the
    * rollup keyed on lang via a doc_id-keyed attach; the one IEEE
    * division happens after exact integer sums.
    */
  def unigramFertilityByLang(docs: DataFrame): DataFrame = {
    val (vocab, allSubs, release) = learn(docs)
    val nPieces = segmented(allSubs, withScores(vocab))
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
      .localCheckpoint(true)
    release()
    Bpe.docWords(docs)
      .join(nPieces, Seq("w"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum(col("n_pieces")).as("n_tokens"), count(lit(1)).as("n_words"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words").cast("double"))
  }

  private var sinkCounter = 0

  /** Streaming tokenizer-fertility twin for the unigram family (the
    * `streaming_wordpiece_fertility` shape, with one structural
    * difference worth having both of: WordPiece tokenizes INSIDE the
    * stream's map stage via the trie generator, while the unigram model
    * is learned batch-side first and the stream attaches it as a
    * STREAM–STATIC broadcast equi-join on the word — the deployment
    * shape for any learned tokenizer/scorer swept over a live crawl).
    * Per-language fertility counters are a complete-mode aggregate —
    * bounded state, one row per language; draining the finite gate
    * corpus must reproduce the batch oracle's totals exactly.
    */
  def runStreamingFertility(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val (vocab, allSubs, release) = learn(docs)
    val nPieces = segmented(allSubs, withScores(vocab))
      .select(col("w"), size(col("pieces")).cast("long").as("n_pieces"))
      .localCheckpoint(true)
    release()
    val src = graft.sources.StreamingSources.docSource(spark, sfDir)
    val agg = src
      .select(col("lang"),
        explode(TextAnalysis.wsTokens(lower(col("text")))).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(nPieces), Seq("w")) // stream–static model attach
      .groupBy("lang")
      .agg(sum(col("n_pieces")).as("n_tokens"), count(lit(1)).as("n_words"))
    val qn = synchronized { sinkCounter += 1; s"graft_unigram_sink_$sinkCounter" }
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // The memory sink has materialized; the pinned model is no longer
    // referenced — release it (the StorageResidueSpec discipline).
    Checkpoints.release(nPieces)
    spark.table(qn)
      .select(col("lang"), col("n_tokens"), col("n_words"),
        (col("n_tokens").cast("double") / col("n_words").cast("double")).as("fertility"))
  }

  // ---- oracles ----------------------------------------------------------

  /** The per-round DP/backwalk CTE block: dp as a linear recursion over
    * positions carrying (best, bp) lists, walk as a second recursion,
    * Viterbi candidates generated with the IDENTICAL p = 1..MaxPiece
    * strict-> chain as [[dpExpr]].
    */
  private def duckRound(r: Int, scoresCte: String): String = {
    // jn = j + 1 is the position this recursion step fills
    def vp(p: Int) =
      s"(best[j - $p + 2] + map_extract(m, (j - $p + 2) * 8 + $p)[1])"
    var vChain = vp(1)
    var pChain = "1"
    for (p <- 2 to MaxPiece) {
      val cond = s"j + 1 >= $p AND ${vp(p)} IS NOT NULL AND ${vp(p)} > ($vChain)"
      vChain = s"CASE WHEN $cond THEN ${vp(p)} ELSE ($vChain) END"
      pChain = s"CASE WHEN $cond THEN $p ELSE ($pChain) END"
    }
    s"""cand$r AS MATERIALIZED (
       |  SELECT s.w, s.c, s.pos, s.len, v.score
       |  FROM subs s JOIN $scoresCte v USING (piece)),
       |entries$r AS MATERIALIZED (
       |  SELECT w, c, map_from_entries(list({'k': pos * 8 + len, 'v': score})) AS m
       |  FROM cand$r GROUP BY w, c),
       |dp$r(w, c, m, j, best, bp) AS (
       |  SELECT w, c, m, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[]) FROM entries$r
       |  UNION ALL
       |  SELECT w, c, m, j + 1, list_append(best, $vChain), list_append(bp, $pChain)
       |  FROM dp$r WHERE j < length(w)),
       |seg$r AS MATERIALIZED (SELECT w, c, bp FROM dp$r WHERE j = length(w)),
       |walk$r(w, c, j, ps) AS (
       |  SELECT w, c, CAST(length(w) AS INT), CAST([] AS VARCHAR[]) FROM seg$r
       |  UNION ALL
       |  SELECT k.w, k.c, k.j - s.bp[k.j],
       |    list_append(k.ps, substr(k.w, k.j - s.bp[k.j] + 1, s.bp[k.j]))
       |  FROM walk$r k JOIN seg$r s ON k.w = s.w WHERE k.j > 0)""".stripMargin
  }

  /** CTE chain: word histogram → substrings → seed vocab → `rounds`
    * EM rounds; ends with `vocab$rounds` and `tot$rounds` in scope.
    */
  private def duckEmCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""wc AS (${Bpe.duckWc}),
         |subs AS MATERIALIZED (
         |  SELECT w, c, CAST(p AS INT) AS pos, CAST(l AS INT) AS len,
         |    substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece
         |  FROM wc,
         |    unnest(generate_series(1, length(w))) g(p),
         |    unnest(generate_series(1, $MaxPiece)) h(l)
         |  WHERE p + l - 1 <= length(w)),
         |seedc AS MATERIALIZED (SELECT piece, CAST(sum(c) AS BIGINT) AS cnt FROM subs GROUP BY 1),
         |chars0 AS MATERIALIZED (SELECT piece, cnt FROM seedc WHERE length(piece) = 1),
         |multi0 AS MATERIALIZED (SELECT piece, cnt FROM seedc WHERE length(piece) > 1
         |           ORDER BY cnt DESC, piece LIMIT $SeedMulti),
         |vocab0 AS MATERIALIZED (SELECT * FROM chars0 UNION ALL SELECT * FROM multi0),
         |tot0 AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vocab0),
         |scores0 AS MATERIALIZED (SELECT piece, ${duckQlog2("cnt")} - ${duckQlog2("tot")} AS score
         |            FROM vocab0 CROSS JOIN tot0)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= ",\n"
      sb ++= duckRound(r, s"scores${r - 1}")
      sb ++=
        s""",
           |pieces$r AS MATERIALIZED (SELECT w, c, unnest(ps) AS piece FROM walk$r WHERE j = 0),
           |counts$r AS MATERIALIZED (SELECT piece, CAST(sum(c) AS BIGINT) AS cnt FROM pieces$r GROUP BY 1),
           |vocab$r AS MATERIALIZED (
           |  SELECT c0.piece, greatest(coalesce(n.cnt, 0), 1) AS cnt
           |  FROM chars0 c0 LEFT JOIN counts$r n USING (piece)
           |  UNION ALL
           |  SELECT m0.piece, n.cnt FROM multi0 m0 JOIN counts$r n USING (piece)
           |  WHERE n.cnt > 0),
           |tot$r AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM vocab$r),
           |scores$r AS MATERIALIZED (SELECT piece, ${duckQlog2("cnt")} - ${duckQlog2("tot")} AS score
           |             FROM vocab$r CROSS JOIN tot$r)""".stripMargin
    }
    sb.toString
  }

  private def duckLearn(rounds: Int): String =
    s"""WITH RECURSIVE ${duckEmCtes(rounds)}
       |SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars, cnt,
       |  ${duckQlog2("cnt")} - ${duckQlog2("tot")} AS qscore
       |FROM vocab$rounds CROSS JOIN tot$rounds
       |ORDER BY cnt DESC, piece""".stripMargin

  private def duckTokenizeStats(rounds: Int): String = {
    val fin = rounds + 1
    s"""WITH RECURSIVE ${duckEmCtes(rounds)},
       |${duckRound(fin, s"scores$rounds")},
       |npieces AS MATERIALIZED (
       |  SELECT w, CAST(length(ps) AS BIGINT) AS n_pieces FROM walk$fin WHERE j = 0)
       |SELECT d.doc_id, CAST(sum(t.n_pieces) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_words
       |FROM (${Bpe.duckWords}) d JOIN npieces t ON d.w = t.w
       |WHERE d.w <> ''
       |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin
  }

  private def duckFertilityByLang(rounds: Int): String = {
    val fin = rounds + 1
    s"""WITH RECURSIVE ${duckEmCtes(rounds)},
       |${duckRound(fin, s"scores$rounds")},
       |npieces AS MATERIALIZED (
       |  SELECT w, CAST(length(ps) AS BIGINT) AS n_pieces FROM walk$fin WHERE j = 0)
       |SELECT d2.lang, CAST(sum(t.n_pieces) AS BIGINT) AS n_tokens,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(t.n_pieces) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fertility
       |FROM (${Bpe.duckWords}) d JOIN npieces t ON d.w = t.w
       |JOIN documents d2 ON d.doc_id = d2.doc_id
       |WHERE d.w <> ''
       |GROUP BY d2.lang ORDER BY d2.lang""".stripMargin
  }

  val engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "unigram_learn",
      (s, dir) => unigramLearn(Tables.documents(s, dir)),
      Some(duckLearn(Rounds)),
    ),
    EngineQuery(
      "unigram_tokenize_stats",
      (s, dir) => unigramTokenizeStats(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(duckTokenizeStats(Rounds)),
      headline = true,
    ),
    EngineQuery(
      "unigram_fertility_by_lang",
      (s, dir) => unigramFertilityByLang(Tables.documents(s, dir)).orderBy("lang"),
      Some(duckFertilityByLang(Rounds)),
    ),
    // Streaming twin: must equal the batch rollup exactly (same oracle).
    EngineQuery(
      "streaming_unigram_fertility",
      (s, dir) => runStreamingFertility(s, dir).orderBy("lang"),
      Some(duckFertilityByLang(Rounds)),
    ),
  )
}
