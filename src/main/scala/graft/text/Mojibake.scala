package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Mojibake detection and repair — the ftfy pass (Speer,
  * "fixes text for you") every web-scrape pipeline runs before
  * tokenization: text that went through a UTF-8 → Latin-1 → UTF-8
  * mis-decode carries telltale byte-pair sequences ('Ã©' where 'é'
  * was meant, 'â€œ' for '“', 'Â ' for a non-breaking space), plus
  * replacement characters (U+FFFD) from lossy decodes. This operator
  * counts the telltales, repairs the fixed double-encoding table, and
  * strips replacement chars — all as per-row regexp/translate
  * projections, zero shuffle at any scale.
  *
  * The harness corpus is clean ASCII (TESTDATA.md), so — exactly like
  * [[TextAnalysis.nfcNormalized]] and
  * [[QualityFilters.withSyntheticLines]] — the GATE query first
  * injects deterministic mojibake by doc_id cohort (both engines build
  * the identical corrupted text), then detection/repair is exercised
  * on every rule. The repair table is the standard Latin-1-of-UTF-8
  * pairs for the characters injected; production extends the same
  * translate/replace chain.
  */
object Mojibake {

  /** (corrupted, fixed) pairs: UTF-8 bytes of the fixed form read back
    * as Latin-1/Windows-1252. */
  val Repairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã±" -> "ñ",
    "â€œ" -> "“", "â€" -> "”", "â€™" -> "’",
    "Â " -> " ")

  /** Deterministic corruption by doc_id mod 7: appended tokens carry
    * one mojibake pattern each; cohorts 5-6 stay clean (negative
    * cases). Cohort 4 gets a U+FFFD replacement char. */
  def withInjectedMojibake(docs: DataFrame): DataFrame = {
    val m = pmod(col("doc_id"), lit(7))
    docs.withColumn("text",
      when(m === 0, concat(col("text"), lit(" CafÃ© dÃ©jÃ ")))
        .when(m === 1, concat(col("text"), lit(" â€œquotedâ€™")))
        .when(m === 2, concat(col("text"), lit(" naÃ¯ve rÃ©sumÃ©")))
        .when(m === 3, concat(col("text"), lit("Â boundedÂ space")))
        .when(m === 4, concat(col("text"), lit(" lost�char")))
        .otherwise(col("text")))
  }

  private def countOcc(c: Column, pat: String): Column =
    (length(c) - length(regexp_replace(c, pat, ""))).cast("long")

  /** Detection counts + repaired text hash. `n_latin_pairs` counts the
    * two-char Latin-1-of-UTF-8 lead bytes ('Ã'/'â'/'Â' followed by
    * anything — the ftfy heuristic trigger); `n_repl` counts U+FFFD.
    * The repair applies [[Repairs]] longest-first, then drops
    * remaining U+FFFD. */
  def mojibakeScan(docs: DataFrame): DataFrame = {
    val fixed = Repairs.foldLeft(col("text")) { case (c, (bad, good)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(bad), good)
    }
    graft.Partitioning.fanOut(docs)
      .select(
        col("doc_id"),
        col("text").as("__orig"),
        // each '[ÃâÂ].' match is exactly 2 chars, so halve the removed-
        // length delta to report true MATCH counts (n_repl/n_ctrl use
        // 1-char patterns and need no correction)
        (countOcc(col("text"), "[ÃâÂ].") / 2).cast("long").as("n_latin_pairs"),
        countOcc(col("text"), "�").as("n_repl"),
        (length(col("text")) - length(regexp_replace(col("text"), "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")))
          .cast("long").as("n_ctrl"),
        regexp_replace(fixed, "�", "").as("__fixed"))
      .withColumn("is_suspect",
        col("n_latin_pairs") > 0 || col("n_repl") > 0 || col("n_ctrl") > 0)
      .withColumn("fixed_md5", md5(col("__fixed")))
      .withColumn("changed", col("__fixed") =!= col("__orig"))
      .drop("__fixed", "__orig")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "mojibake_scan_fix",
      (s, dir) => mojibakeScan(withInjectedMojibake(Tables.documents(s, dir)))
        .orderBy("doc_id"),
      Some {
        val inject =
          """CASE (doc_id % 7)
            |    WHEN 0 THEN text || ' CafÃ© dÃ©jÃ '
            |    WHEN 1 THEN text || ' â€œquotedâ€™'
            |    WHEN 2 THEN text || ' naÃ¯ve rÃ©sumÃ©'
            |    WHEN 3 THEN text || 'Â boundedÂ space'
            |    WHEN 4 THEN text || ' lost' || chr(65533) || 'char'
            |    ELSE text END""".stripMargin
        val fixExpr = Repairs.foldLeft("text") { case (acc, (bad, good)) =>
          val b = bad.replace("'", "''"); val g = good.replace("'", "''")
          s"replace($acc, '$b', '$g')"
        }
        s"""WITH t AS (SELECT doc_id, $inject AS text FROM documents),
           |m AS (SELECT doc_id, text,
           |  CAST((length(text) - length(regexp_replace(text, '[ÃâÂ].', '', 'g'))) // 2 AS BIGINT) AS n_latin_pairs,
           |  CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT) AS n_repl,
           |  CAST(length(text) - length(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS BIGINT) AS n_ctrl,
           |  replace($fixExpr, chr(65533), '') AS fixed
           |  FROM t)
           |SELECT doc_id, n_latin_pairs, n_repl, n_ctrl,
           |  (n_latin_pairs > 0 OR n_repl > 0 OR n_ctrl > 0) AS is_suspect,
           |  md5(fixed) AS fixed_md5,
           |  fixed <> text AS changed
           |FROM m ORDER BY doc_id""".stripMargin
      },
    ),
  )
}
