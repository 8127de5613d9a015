package graft.sources

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** The reference's faithful source: a directory of whole text files
  * (reference `src/helper.cpp:21-39` reads every `*.txt` under the
  * dataset dir, one string per file), prepared by a decompress step
  * (`scripts/decompressor.sh`, H-1) and a FASTA-clean step
  * (`scripts/modifier.sh:15-20`: `grep -v "^>" | tr -d '\n\r'`, H-2).
  *
  * Spark-first shape:
  *  - dir scan = `spark.read.option("wholetext", true).text(dir)` — one
  *    row per file, `input_file_name()` for provenance;
  *  - decompress = the codec layer (files are written .gz; the text
  *    source decompresses transparently — the H-1 analog);
  *  - FASTA clean = codegen'd `regexp_replace` projection;
  *  - per-file window barriers fall out of per-row processing (M-2).
  *
  * The harness serves parquet, not a text dir, so [[materializeCorpus]]
  * first lays the `documents` table out as one gzipped FASTA-style file
  * per doc under target/ (test plumbing — on a real deployment the
  * corpus already exists as files and only [[readCorpus]] onward runs).
  *
  * Scale notes: `wholetext` materializes one file per row, so row size
  * is bounded by file size — the right contract for corpus shards (the
  * reference holds whole files in memory the same way); cleaning and
  * windowing stay narrow per-row projections, and the only shuffle in
  * the kmer pipeline is the final group-count.
  */
object CorpusSource {

  /** One-time layout of `documents` as a FASTA-style corpus dir:
    * `<repo>/target/graft_corpus/<sf>/doc_id=N/part-*.txt.gz`, each file
    * `">doc N\n" + text`. Idempotent via the writer's _SUCCESS marker.
    */
  private def corpusBase: String = graft.OutDir.base

  /** One layout implementation for both corpus variants: FASTA-style
    * `">doc N\n" + text`, one file per doc, idempotent via _SUCCESS.
    */
  private def materialize(
      spark: SparkSession, sfDir: String, subdir: String, compression: Option[String]): String =
    synchronized {
      val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
      val dir = s"$corpusBase/$subdir/$name"
      if (!new File(dir, "_SUCCESS").exists()) {
        val w = Tables.documents(spark, sfDir)
          .select(
            col("doc_id"),
            concat(lit(">doc "), col("doc_id"), lit("\n"), col("text")).as("value"))
          .write.partitionBy("doc_id")
          .mode("overwrite")
        compression.fold(w)(c => w.option("compression", c)).text(dir)
      }
      dir
    }

  def materializeCorpus(spark: SparkSession, sfDir: String): String =
    materialize(spark, sfDir, "graft_corpus", Some("gzip"))

  /** Uncompressed corpus layout for the binary-file source (gzip bytes
    * embed no header timestamp with Spark's codec, but plain bytes make
    * the content-hash oracle trivially engine-portable). One `.txt`
    * file per doc: `">doc N\n" + text`.
    */
  def materializeBinaryCorpus(spark: SparkSession, sfDir: String): String =
    materialize(spark, sfDir, "graft_corpus_bin", None)

  /** Multimodal ingestion source: `binaryFile` reads whole files as
    * opaque byte payloads with filesystem metadata — the real entry
    * point for image/audio/video corpora (the [[graft.multimodal]]
    * decode pipeline starts from exactly this relation shape).
    */
  def readBinaryCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
        col("length"),
        col("content"))

  /** M-1: whole-file dir scan with provenance. One row per file. */
  def readCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(input_file_name().as("file"), col("value"))

  /** H-2: FASTA clean — drop `>` header lines, strip newlines. */
  def fastaClean(c: Column): Column =
    regexp_replace(regexp_replace(c, "(?m)^>.*$", ""), "[\\n\\r]", "")

  /** Full faithful ingestion: scan → clean → (doc_id from provenance). */
  def cleanedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = materializeCorpus(spark, sfDir)
    readCorpus(spark, dir)
      .select(
        regexp_extract(col("file"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
        fastaClean(col("value")).as("text"))
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    // Ingestion identity: file-per-doc roundtrip reproduces the exact
    // document bytes (headers stripped, newlines removed — documents
    // carry neither, so cleaned content must equal the original text).
    EngineQuery(
      "corpus_clean_roundtrip",
      (s, dir) =>
        cleanedCorpus(s, dir)
          .select(col("doc_id"), md5(col("text")).as("content_md5"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS content_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // binaryFile ingestion: whole-file byte payloads + metadata, content
    // verified by md5 against the document reconstruction. The text
    // writer appends a trailing newline per row — included in the hash.
    EngineQuery(
      "binaryfile_source_scan",
      (s, dir) => {
        val bin = readBinaryCorpus(s, materializeBinaryCorpus(s, dir))
        bin.select(
          col("doc_id"),
          col("length").as("byte_len"),
          md5(col("content")).as("content_md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode('>doc ' || doc_id || chr(10) || text || chr(10))) AS BIGINT) AS byte_len,
             |  md5('>doc ' || doc_id || chr(10) || text || chr(10)) AS content_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // The reference's whole pipeline over the faithful source: dir scan
    // → decompress (gzip codec) → FASTA clean → k-mer map → group-count.
    EngineQuery(
      "corpus_kmer",
      (s, dir) =>
        graft.kmer.Kmers
          .kmerCounts(cleanedCorpus(s, dir), "text", 3)
          .orderBy("word"),
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT substr(text, CAST(unnest(generate_series(1, length(text) - 2)) AS INT), 3) AS word
             |  FROM documents WHERE length(text) >= 3)
             |GROUP BY word ORDER BY word""".stripMargin),
    ),
  )
}
