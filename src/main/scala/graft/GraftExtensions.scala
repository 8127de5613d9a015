package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine function registration, packaged both ways Spark supports:
  *
  *  - [[GraftExtensions]] for session-creation time
  *    (`.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions`) — the idiomatic
  *    deployment for a cluster;
  *  - [[GraftFunctions.register]] for an already-running session
  *    (idempotent; the library's internal entry points call it so the
  *    functions work regardless of how the session was built).
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kmer_windows" -> { exprs =>
      kmer.KmerGenerator(exprs.head, exprs(1).eval(null).asInstanceOf[Number].intValue())
    },
    "kmer_windows_pos" -> { exprs =>
      kmer.KmerGenerator(
        exprs.head, exprs(1).eval(null).asInstanceOf[Number].intValue(), withPos = true)
    },
    "ngram_hashes" -> { exprs =>
      text.NgramHashGenerator(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Number].intValue())
    },
    // rolling_hashes(text, k[, keepMod]): all k-window hashes, or the
    // content-defined h % keepMod == 0 sample filtered INSIDE the
    // generator (discarded windows never become rows)
    "rolling_hashes" -> { exprs =>
      text.RollingHashGenerator(
        exprs.head, exprs(1).eval(null).asInstanceOf[Number].intValue(),
        winnowW = 0,
        keepMod =
          if (exprs.length > 2) exprs(2).eval(null).asInstanceOf[Number].intValue() else 1)
    },
    "winnow_fingerprints" -> { exprs =>
      text.RollingHashGenerator(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Number].intValue())
    },
    // ac_matches(text, 'p1|p2|…'): every occurrence of every literal
    // pattern (overlapping included) via a per-executor-cached
    // Aho-Corasick automaton — O(text + matches), dictionary-size-free
    "ac_matches" -> { exprs => text.AhoCorasickGenerator(exprs.head, exprs(1)) },
    // wordpiece_pieces(word, 'p1|p2|…'): greedy longest-match subword
    // segmentation against a per-executor-cached trie; pid -1 = UNK
    "wordpiece_pieces" -> { exprs => text.WordPieceGenerator(exprs.head, exprs(1)) },
    // topk_pairs(score, id, k): bounded-heap per-group top-k aggregate
    // (k-sized state, map-side-combinable) — the no-window-sort top-N
    "topk_pairs" -> { exprs => functions.TopKPairs(exprs(0), exprs(1), exprs(2)) },
    "dot_i64" -> { exprs => functions.DotI64(exprs.head, exprs(1)) },
    // dot_feats_w(feats, w): sparse (bucket, count) · dense weights —
    // the perceptron margin as one codegen'd loop (no per-element HOF
    // interpretation); see functions.DotFeatsW
    "dot_feats_w" -> { exprs => functions.DotFeatsW(exprs.head, exprs(1)) },
    // lcs_len(a, b): longest common SUBSEQUENCE length over two token
    // arrays — the ROUGE-L core as one codegen'd two-row DP loop
    "lcs_len" -> { exprs => functions.LcsLen(exprs.head, exprs(1)) },
    // unigram_segment(w, m, maxPiece): Viterbi DP + backwalk over one
    // word under a (pos*8+len → score) candidate map — the unigram-LM
    // EM hot loop as one codegen'd pass (no per-element HOF
    // interpretation, no per-step accumulator array copies)
    "unigram_segment" -> { exprs =>
      functions.UnigramSegment(
        exprs.head, exprs(1), exprs(2).eval(null).asInstanceOf[Number].intValue())
    },
    // common_run_len(ta, pa, tb, pb, bound, step): maximal aligned
    // char run extending right (step=+1) or left (step=-1) from two
    // seed anchors — the winnowing seed extension as one byte-walking
    // codegen'd pass (no per-block interpreted substring re-scans)
    "common_run_len" -> { exprs =>
      functions.CommonRunLen(
        exprs(0), exprs(1), exprs(2), exprs(3), exprs(4),
        exprs(5).eval(null).asInstanceOf[Number].intValue())
    },
    // bpe_merge_all(syms, as, bs): sequential greedy-leftmost replay of
    // a whole BPE merge table, each merge one in-place codegen'd pass
    // (no chained per-element HOF folds); see functions.BpeMergeAll
    "bpe_merge_all" -> { exprs => functions.BpeMergeAll(exprs(0), exprs(1), exprs(2)) },
    "nfc_normalize" -> { exprs => functions.NfcNormalize(exprs.head) },
    // char_entropy_q(text): (n, nd, hq) — the fixed-point entropy lane
    // as one tight code-point histogram loop per row (HOF lambdas
    // interpret per element; see functions.CharEntropyQ)
    "char_entropy_q" -> { exprs => functions.CharEntropyQ(exprs.head) },
    // Spark ships these sketch expressions for its own runtime join
    // filters but leaves them out of the public registry; the engine
    // exposes them under the upstream names for bounded-size semi-join
    // pre-filters (see Curation.decontaminateBloom).
    "bloom_filter_agg" -> { exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))
    },
    "might_contain" -> { exprs =>
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
    },
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, null, "", "", "", "", "", "", "scala_udf")

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }

  private[graft] def inject(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), b))
    }
    ext.injectOptimizerRule(_ => plans.RewriteDotProduct)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
