package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Deduplication operators for a training-data pipeline (north-star
  * extension; the reference's only dedup is the output `unordered_set`,
  * `src/main.cpp:65-70`):
  *
  *  - exact dedup: hash-groupBy on content md5;
  *  - near-dup MinHash: per-doc signature = min-hash over 8-char
  *    shingles, 16 hash functions; LSH banding (4 bands × 4 rows) turns
  *    the all-pairs O(n²) comparison into an equi-join on band values —
  *    the scale path for 100 TB (candidate pairs only, never the cross
  *    product);
  *  - SimHash: 16-bit weighted token hash;
  *  - n-gram Jaccard: word-5-gram shingle join with a document-frequency
  *    cap (drops shingles appearing in >50 docs — the classic hot-key
  *    guard that keeps the shingle self-join from exploding on stopword
  *    shingles);
  *  - embedding near-dup: sign-LSH bucketing (8 hyperplane signs) then
  *    within-bucket exact cosine on quantized vectors.
  *
  * Hash portability: all hashing is md5-hex-derived (identical in Spark
  * and DuckDB); MinHash permutation i is `md5('<i>|' || shingle)`;
  * SimHash bit j is the high bit of hex digit j of md5(token), i.e.
  * `substr(md5(t), j+1, 1) ∈ [8-f]`. Cosine uses floor(x*1000) integer
  * quantization so dot products are exact and engine-independent.
  */
object Dedup {

  val NumPerms = 16
  val NumBands = 4 // 4 rows per band
  val ShingleK = 8

  /** Distinct k-char shingles per document. */
  def docShingles(docs: DataFrame, k: Int): DataFrame = {
    val c = col("text")
    docs.where(length(c) >= k)
      .select(col("doc_id"), explode(sequence(lit(1), length(c) - (k - 1))).as("p"), c.as("__t"))
      .select(col("doc_id"), col("__t").substr(col("p"), lit(k)).as("shingle"))
      .distinct()
  }

  /** MinHash signature: one column h0..h{n-1} per permutation. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = docShingles(docs, ShingleK)
    val aggs = (0 until NumPerms).map { i =>
      min(substring(md5(concat(lit(s"$i|"), col("shingle"))), 1, 8)).as(s"h$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band_idx, band_val): LSH banding of the signature. */
  def minhashBands(sigs: DataFrame): DataFrame = {
    val rows = NumPerms / NumBands
    val bandVals = (0 until NumBands).map { b =>
      concat((0 until rows).map(r => col(s"h${b * rows + r}")): _*)
    }
    sigs.select(
      col("doc_id"),
      posexplode(array(bandVals: _*)).as(Seq("band_idx", "band_val")))
  }

  /** Candidate near-dup pairs: docs sharing at least one LSH band. */
  def minhashCandidatePairs(docs: DataFrame): DataFrame = {
    val bands = minhashBands(minhashSignatures(docs))
    val a = bands.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_val"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** 16-bit SimHash over lowercase whitespace tokens (with multiplicity). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 16).map { j =>
      sum(when(instr(lit("89abcdef"), substring(col("h"), j + 1, 1)) > 0, 1).otherwise(-1)).as(s"s$j")
    }
    val bits = (0 until 16).map(j => when(col(s"s$j") > 0, "1").otherwise("0"))
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), concat(bits: _*).as("simhash16"))
  }

  /** Distinct word-5-gram shingles per doc. */
  def wordNgrams(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .where(size(col("t")) >= n)
      .select(
        col("doc_id"),
        explode(expr(s"transform(sequence(1, size(t) - ${n - 1}), i -> concat_ws(' ', slice(t, i, $n)))"))
          .as("gram"))
      .distinct()

  /** Near-dup pairs by n-gram Jaccard with a shingle df cap. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5, maxDf: Int = 50, minJaccard: Double = 0.05): DataFrame = {
    val grams = wordNgrams(docs, n)
    val rare = grams.groupBy("gram").agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
    val g = grams.join(rare.select("gram"), Seq("gram"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = g.select(col("doc_id").as("doc_a"), col("gram"))
    val b = g.select(col("doc_id").as("doc_b"), col("gram"))
    a.join(b, Seq("gram")).where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** Quantized embedding: floor(x*1000) per element — exact integer dot
    * products, engine-portable.
    */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
      .withColumn("nrm", expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))

  /** Sign-LSH bucket: concat of sign bits of the first `bits` dims. */
  def signBucket(vecCol: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(vecCol, i + 1).cast("double") > 0, "1").otherwise("0")): _*)

  /** Embedding near-dup: within-bucket exact quantized cosine. */
  def embeddingNearDupPairs(embeddings: DataFrame, bits: Int = 8): DataFrame = {
    val q = quantized(embeddings)
      .withColumn("bucket", signBucket(col("q"), bits))
    val a = q.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nrm").as("na"), col("bucket"))
    val b = q.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket")).where(col("vec_a") < col("vec_b"))
      .withColumn("dot", expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("sim",
        col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .select("bucket", "vec_a", "vec_b", "sim")
  }

  // --------------------------------------------------------------- oracles

  /** DuckDB CTE for distinct k-shingles per doc. */
  private def duckShingles(k: Int): String =
    s"""SELECT DISTINCT doc_id, substr(text, CAST(unnest(generate_series(1, length(text) - ${k - 1})) AS INT), $k) AS shingle
       |FROM documents WHERE length(text) >= $k""".stripMargin

  private val duckSig: String = {
    val aggs = (0 until NumPerms)
      .map(i => s"min(substr(md5('$i|' || shingle), 1, 8)) AS h$i").mkString(",\n  ")
    s"""SELECT doc_id, $aggs FROM (${duckShingles(ShingleK)}) GROUP BY doc_id"""
  }

  private val duckBands: String = {
    val rows = NumPerms / NumBands
    val selects = (0 until NumBands).map { b =>
      val cat = (0 until rows).map(r => s"h${b * rows + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band_idx, $cat AS band_val FROM sig"
    }
    selects.mkString("\nUNION ALL\n")
  }

  def engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "dedup_exact",
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(md5(col("text")).as("hash"))
          .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
          .orderBy("hash"),
      Some("""SELECT md5(text) AS hash, count(*) AS cnt, min(doc_id) AS keeper
             |FROM documents GROUP BY hash ORDER BY hash""".stripMargin),
    ),
    EngineQuery(
      "minhash_signatures",
      (s, dir) => {
        val sig = minhashSignatures(Tables.documents(s, dir))
        sig.select(
          col("doc_id"),
          concat_ws("|", (0 until NumPerms).map(i => col(s"h$i")): _*).as("sig"))
          .orderBy("doc_id")
      },
      Some {
        val cat = (0 until NumPerms).map(i => s"h$i").mkString(" || '|' || ")
        s"""WITH sig AS ($duckSig)
           |SELECT doc_id, $cat AS sig FROM sig ORDER BY doc_id""".stripMargin
      },
      headline = true,
    ),
    EngineQuery(
      "minhash_lsh_pairs",
      (s, dir) =>
        minhashCandidatePairs(Tables.documents(s, dir)).orderBy("doc_a", "doc_b"),
      Some(
        s"""WITH sig AS ($duckSig),
           |bands AS ($duckBands)
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           |WHERE a.doc_id < b.doc_id ORDER BY doc_a, doc_b""".stripMargin),
    ),
    EngineQuery(
      "simhash_signatures",
      (s, dir) => simhash(Tables.documents(s, dir)).orderBy("doc_id"),
      Some {
        val sums = (0 until 16)
          .map(j => s"sum(CASE WHEN strpos('89abcdef', substr(h, ${j + 1}, 1)) > 0 THEN 1 ELSE -1 END) AS s$j")
          .mkString(",\n  ")
        val bits = (0 until 16).map(j => s"CASE WHEN s$j > 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH toks AS (
           |  SELECT doc_id, md5(tok) AS h FROM (
           |    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents)
           |  WHERE tok <> ''),
           |sums AS (SELECT doc_id, $sums FROM toks GROUP BY doc_id)
           |SELECT doc_id, $bits AS simhash16 FROM sums ORDER BY doc_id""".stripMargin
      },
    ),
    EngineQuery(
      "ngram_jaccard_pairs",
      (s, dir) => ngramJaccardPairs(Tables.documents(s, dir)).orderBy("doc_a", "doc_b"),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id, array_to_string(t[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS gram
             |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 4)) AS i FROM toks WHERE length(t) >= 5)),
             |rare AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) <= 50),
             |g AS (SELECT doc_id, grams.gram FROM grams JOIN rare ON grams.gram = rare.gram),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
             |pairs AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
             |  FROM g a JOIN g b ON a.gram = b.gram WHERE a.doc_id < b.doc_id
             |  GROUP BY doc_a, doc_b)
             |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
             |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
             |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
             |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.05
             |ORDER BY doc_a, doc_b""".stripMargin),
    ),
    EngineQuery(
      "embedding_neardup_pairs",
      (s, dir) => embeddingNearDupPairs(Tables.embeddings(s, dir)).orderBy("bucket", "vec_a", "vec_b"),
      Some {
        val bucket = (0 until 8)
          .map(i => s"CASE WHEN CAST(embedding[${i + 1}] AS DOUBLE) > 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH q AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q,
           |    $bucket AS bucket
           |  FROM embeddings),
           |n AS (SELECT vec_id, q, bucket,
           |  CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS nrm FROM q)
           |SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  CAST(CAST(list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
           |    / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS sim
           |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |ORDER BY bucket, vec_a, vec_b""".stripMargin
      },
    ),
  )
}
