package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Corpus-level line deduplication — the CCNet/RefinedWeb boilerplate
  * remover (Wenzek et al. 2020 §2.1 dedup lines across shards; Penedo
  * et al. 2023 line-wise corrections): a line whose normalized form
  * appears in at least `minDocs` DISTINCT documents is boilerplate
  * (navigation, cookie banners, license headers) and is dropped from
  * EVERY document; the cleaned document preserves the surviving lines
  * in their original order. Distinct from [[QualityFilters.c4LineFilter]]
  * (per-line predicates, no corpus state) and from
  * [[graft.dedup.SubstringDup]] (char-gram copies at any offset):
  * this one needs a corpus-wide line-frequency table.
  *
  * Scale shape: lines travel the wire only as md5 hashes — the
  * frequency aggregation is partial+final on the 16-byte hash, and the
  * membership join back is declarative (AQE broadcasts the common set
  * while it is small, hash-joins on the same key when it is not). The
  * order-preserving rebuild is a per-doc `collect_list` bounded by the
  * document's own size — a row that already had to fit in memory.
  * Nothing driver-side, no all-pairs.
  */
object LineDedup {

  def lineDedup(docs: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"a line is boilerplate across >= 2 docs, got $minDocs")
    val lines = graft.Partitioning.fanOut(docs)
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
      .withColumn("lh", md5(trim(col("line"))))
    val common = lines.groupBy("lh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("lh"), lit(true).as("dup"))
    lines.join(common, Seq("lh"), "left_outer")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("dup")).as("n_dropped"),
        // collect_list skips the null branch → kept lines only; struct
        // sort restores document order before the rebuild. Field
        // extraction is GetArrayStructFields (codegen'd) rather than a
        // transform() lambda interpreted per line (r20).
        md5(array_join(
          array_sort(collect_list(when(col("dup").isNull, struct(col("idx"), col("line")))))
            .getField("line"),
          "\n")).as("clean_md5"))
      .select(col("doc_id"), col("n_lines"), col("n_dropped"),
        (col("n_lines") - col("n_dropped")).as("n_kept"), col("clean_md5"))
  }

  /** Paragraph-granularity twin of [[lineDedup]] — the missing rung of
    * the dedup granularity ladder (doc-level exact dedup /
    * PARAGRAPH / line / char-k-gram substring): a paragraph whose
    * normalized form appears in ≥ `minDocs` distinct documents
    * (license headers, lorem footers, share-this blocks) is dropped
    * from every document; surviving paragraphs keep their order.
    * Same 100 TB shape as lines: paragraphs cross the wire only as
    * md5 hashes, the rebuild is a per-doc collect_list bounded by the
    * document's own size.
    */
  def paragraphDedup(docs: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"a paragraph is boilerplate across >= 2 docs, got $minDocs")
    val paras = graft.Partitioning.fanOut(docs)
      .select(col("doc_id"), posexplode(split(col("text"), "\n\n")).as(Seq("idx", "para")))
      .withColumn("ph", md5(trim(col("para"))))
    val common = paras.groupBy("ph")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("ph"), lit(true).as("dup"))
    paras.join(common, Seq("ph"), "left_outer")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        count(col("dup")).as("n_dropped"),
        md5(array_join(
          array_sort(collect_list(when(col("dup").isNull, struct(col("idx"), col("para")))))
            .getField("para"),
          "\n\n")).as("clean_md5"))
      .select(col("doc_id"), col("n_paras"), col("n_dropped"),
        (col("n_paras") - col("n_dropped")).as("n_kept"), col("clean_md5"))
  }

  private val duckParagraphDedup =
    "WITH " + QualityFilters.duckSyntheticParaDocs + ",\n" +
    """p AS (SELECT doc_id, i AS idx, md5(trim(paras[CAST(i AS INT)])) AS ph,
       |             paras[CAST(i AS INT)] AS para
       |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS paras FROM doc),
       |       unnest(generate_series(1, length(paras))) AS g(i)),
       |common AS (SELECT ph FROM p GROUP BY ph HAVING count(DISTINCT doc_id) >= 2),
       |agg AS (SELECT p.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_paras,
       |  CAST(count(c.ph) AS BIGINT) AS n_dropped,
       |  md5(coalesce(string_agg(CASE WHEN c.ph IS NULL THEN p.para END, chr(10) || chr(10) ORDER BY p.idx), '')) AS clean_md5
       |  FROM p LEFT JOIN common c ON p.ph = c.ph
       |  GROUP BY p.doc_id)
       |SELECT doc_id, n_paras, n_dropped, n_paras - n_dropped AS n_kept, clean_md5
       |FROM agg ORDER BY doc_id""".stripMargin

  private val duckLineDedup =
    "WITH " + QualityFilters.duckSyntheticDocs + ",\n" +
    """l AS (SELECT doc_id, i AS idx, md5(trim(lines[CAST(i AS INT)])) AS lh,
       |             lines[CAST(i AS INT)] AS line
       |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM doc),
       |       unnest(generate_series(1, length(lines))) AS g(i)),
       |common AS (SELECT lh FROM l GROUP BY lh HAVING count(DISTINCT doc_id) >= 2),
       |agg AS (SELECT l.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(count(c.lh) AS BIGINT) AS n_dropped,
       |  md5(coalesce(string_agg(CASE WHEN c.lh IS NULL THEN l.line END, chr(10) ORDER BY l.idx), '')) AS clean_md5
       |  FROM l LEFT JOIN common c ON l.lh = c.lh
       |  GROUP BY l.doc_id)
       |SELECT doc_id, n_lines, n_dropped, n_lines - n_dropped AS n_kept, clean_md5
       |FROM agg ORDER BY doc_id""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "line_dedup_corpus",
      (s, dir) => lineDedup(QualityFilters.withSyntheticLines(Tables.documents(s, dir)))
        .orderBy("doc_id"),
      Some(duckLineDedup),
      headline = true,
    ),
    EngineQuery(
      "paragraph_dedup",
      (s, dir) => paragraphDedup(QualityFilters.withSyntheticParagraphs(Tables.documents(s, dir)))
        .orderBy("doc_id"),
      Some(duckParagraphDedup),
    ),
  )
}
