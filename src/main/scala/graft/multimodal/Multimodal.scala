package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{EngineQuery, Tables}

/** Multimodal column plumbing (north-star extension): media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs as a partition-wise typed transform (`mapPartitions` on a
  * `Dataset`), which is Spark's batch-shaped extension point when the
  * logic can't be a Catalyst expression (codec calls, native libs).
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * `FakeDecoder` derives deterministic "features" from the byte length.
  * The Spark-side plumbing — binary schema, typed encoder, partition
  * batching, feature schema — is real and oracle-tested (the stub's
  * arithmetic is replicated in SQL, so the mapPartitions path itself is
  * verified end-to-end, not just row counts).
  *
  * Scale notes: mapPartitions keeps per-partition state (a decoder
  * handle) allocated once per task, not per row; binary payloads never
  * shuffle — features are extracted before any wide operation.
  */
object Multimodal {

  /** A media row: opaque bytes + provenance. */
  final case class MediaRow(doc_id: Long, data: Array[Byte], source: String)

  /** Extracted (fake) media features. */
  final case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long, height: Long, n_frames: Long)

  /** Deterministic stand-in for a real image/video decoder. In a real
    * deployment this would wrap a codec library opened once per
    * partition; shapes and signatures stay identical.
    */
  object FakeDecoder {
    def decode(doc_id: Long, data: Array[Byte]): MediaFeatures = {
      val len = data.length.toLong
      MediaFeatures(
        doc_id = doc_id,
        byte_len = len,
        width = 64 + len % 576,
        height = 64 + (len * 7) % 448,
        n_frames = 1 + len % 30)
    }
  }

  /** documents → media table: text bytes standing in for media payloads
    * (binary column + metadata), preserving the real schema shape.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("data"),
      col("source"))

  /** Partition-wise feature extraction over the binary column. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "data", "source").as[MediaRow]
      .mapPartitions { rows =>
        // decoder handle would be opened here, once per partition
        rows.map(r => FakeDecoder.decode(r.doc_id, r.data))
      }
      .toDF()
  }

  /** Resized media metadata: decoded dims + fit-within-target output
    * dims + the resized (fake RGB) buffer size. */
  final case class ResizedMedia(
      doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, out_bytes: Long)

  /** Partition-wise resize: fit each decoded frame inside
    * `target`×`target` preserving aspect ratio — integer arithmetic,
    * no upscaling (dims already inside the box pass through). The
    * pixel work is stubbed like the decode; a real deployment swaps
    * the arithmetic for the codec's resample inside the SAME
    * mapPartitions batch — schema, per-partition batching, and the
    * downstream contract are what this query pins. `out_bytes` is the
    * RGB buffer the resized frame would occupy, the number a 100 TB
    * preprocessing job uses to budget its output shards.
    */
  def resizeFeatures(media: DataFrame, target: Int = 224): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "data", "source").as[MediaRow]
      .mapPartitions { rows =>
        // resampler handle would be opened here, once per partition
        rows.map { r =>
          val f = FakeDecoder.decode(r.doc_id, r.data)
          val m = math.max(f.width, f.height)
          val (ow, oh) =
            if (m <= target) (f.width, f.height)
            else (math.max(1L, f.width * target / m), math.max(1L, f.height * target / m))
          ResizedMedia(r.doc_id, f.width, f.height, ow, oh, ow * oh * 3L)
        }
      }
      .toDF()
  }

  /** Frame sampling: split a binary payload into fixed-size frames with
    * index metadata — the video-frame / audio-chunk shape, as a pure
    * expression pipeline (binary substring), so it stays inside
    * codegen; frames explode map-side, never shuffling whole payloads.
    */
  def frameSample(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .where(length(col("data")) > 0)
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(ceil(length(data) / CAST($frameBytes AS DOUBLE)) AS INT) - 1),
             |  i -> substring(data, i * $frameBytes + 1, $frameBytes))""".stripMargin))
          .as(Seq("frame_idx", "frame")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"))

  /** A perceptual-hash signature as four 16-bit band lanes. */
  final case class MediaPHash(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Blockhash-style perceptual signature of a media payload — the
    * image-dedup shape (Yang et al.'s Blockhash / pHash family): the
    * payload is cut into 64 equal stripes and bit i is a parity
    * statistic of stripe i, so a LOCAL edit flips only its stripe's
    * bit and near-identical payloads land within a small Hamming
    * distance. Like [[FakeDecoder]], the pixel statistic is a stub
    * (code-point sums per stripe — this container has no image libs);
    * a real deployment swaps in block mean luminance inside the SAME
    * mapPartitions batch. Stripe assignment, parity, band packing, and
    * the downstream Manku band join are the real, tested plumbing.
    */
  def extractPHash(media: DataFrame): Dataset[MediaPHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "data", "source").as[MediaRow]
      .mapPartitions { rows =>
        // codec handle would be opened here, once per partition
        rows.flatMap { r =>
          val cps = new String(r.data, java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().toArray
          if (cps.isEmpty) None
          else {
            val sums = new Array[Long](64)
            var p = 0
            while (p < cps.length) {
              sums((p.toLong * 64 / cps.length).toInt) += cps(p); p += 1
            }
            val bands = new Array[Long](4)
            var i = 0
            while (i < 64) {
              bands(i / 16) |= (sums(i) % 2) << (i % 16); i += 1
            }
            Some(MediaPHash(r.doc_id, bands(0), bands(1), bands(2), bands(3)))
          }
        }
      }
  }

  /** Near-duplicate media pairs by perceptual hash: 4 bands × 16 bits —
    * by pigeonhole any two signatures within Hamming distance 3 share a
    * full band, so the all-pairs scan becomes a band equi-join with the
    * [[graft.dedup.Dedup.simhashNearDupPairs]] Manku shape (per-band
    * candidate cap, integer-lane `bit_count` verify). This is the
    * 100 TB image-dedup plan: one decode pass, one banded equi-join,
    * never an all-pairs distance scan.
    */
  def phashNearDupPairs(
      media: DataFrame, maxHamming: Int = 3, maxBandSize: Int = 100): DataFrame = {
    // Pin the signatures so the DECODE genuinely runs once — the cap
    // window and both join sides otherwise re-run the mapPartitions
    // pass (with a real codec, the expensive part); 5 longs per doc,
    // left pinned for the caller's action (the winnow-index convention:
    // a by-convention pin the harness frees — Bench and Verify
    // unpersist all persistent RDDs after each query).
    val sigs = extractPHash(media).toDF().localCheckpoint(true)
    val bands = sigs.select(
      col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "band_val")))
    val capped = graft.dedup.Dedup.capByKey(bands, Seq("band_idx", "band_val"), maxBandSize)
    def side(s: String) = capped.select(
      Seq(col("doc_id").as(s"doc_$s"), col("band_idx"), col("band_val")) ++
        (0 until 4).map(b => col(s"b$b").as(s"b$b$s")): _*)
    val hamming = (0 until 4)
      .map(b => expr(s"bit_count(b$b" + s"a ^ b$b" + "b)").cast("long"))
      .reduce(_ + _)
    side("a").join(side("b"), Seq("band_idx", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select((Seq(col("doc_a"), col("doc_b")) ++
        (0 until 4).flatMap(b => Seq(col(s"b${b}a"), col(s"b${b}b")))): _*)
      .distinct()
      .withColumn("hamming", hamming)
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Deterministic near-dup media cohort (r16, the `paragraph_dedup`
    * boilerplate-cohort convention): for every document with
    * `doc_id % 97 == 0` whose first character is an ASCII lowercase
    * letter (a..y — so the +1 twin stays ASCII in both engines), inject
    * a twin row (`doc_id + 100000000`) whose first code point is
    * incremented by ONE. That is a same-length local edit: stripe
    * boundaries don't move, exactly stripe 0's code-point sum changes
    * parity, so the twin's signature differs from the original's in
    * exactly ONE bit — a guaranteed Hamming-1 pair through the band
    * join and the `bit_count` verify. Without the cohort the gate
    * passed on 0 = 0 rows at sf0.01 (agreement on empty — the r15
    * verdict's one weak-evidence operator); with it the positive path
    * — band equi-join, per-band cap survival, Hamming arithmetic —
    * is exercised at every gate SF.
    */
  def withNearDupMediaCohort(docs: DataFrame): DataFrame = {
    val cohort = docs
      .where(col("doc_id") % 97 === 0 && ascii(col("text")).between(97, 121))
      .select(
        (col("doc_id") + 100000000L).as("doc_id"),
        concat(expr("char(ascii(text) + 1)"), expr("substring(text, 2)")).as("text"),
        col("source"))
    docs.select("doc_id", "text", "source").unionAll(cohort)
  }

  /** [[withNearDupMediaCohort]] mirrored in DuckDB — a CTE ending in
    * `media_docs(doc_id, text)`.
    */
  private val duckNearDupMediaDocs =
    """media_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000000 AS doc_id,
      |    chr(ord(substr(text, 1, 1)) + 1) || substr(text, 2) AS text
      |  FROM documents
      |  WHERE doc_id % 97 = 0
      |    AND ord(substr(text, 1, 1)) BETWEEN 97 AND 121)""".stripMargin

  def engineQueries: Seq[EngineQuery] = Seq(
    // Frame-sample metadata, verified against arithmetic chunking.
    EngineQuery(
      "frame_sample",
      (s, dir) =>
        frameSample(asMediaTable(Tables.documents(s, dir)), 64)
          .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
             |  CAST(least(64, n - f * 64) AS BIGINT) AS frame_len
             |FROM (
             |  SELECT doc_id, octet_length(encode(text)) AS n,
             |    unnest(generate_series(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1)) AS f
             |  FROM documents WHERE octet_length(encode(text)) > 0)
             |ORDER BY doc_id, frame_idx""".stripMargin),
    ),
    // Binary-column metadata via pure expressions (octet lengths, content
    // hash) — the declarative half of the multimodal surface.
    EngineQuery(
      "binary_meta",
      (s, dir) =>
        asMediaTable(Tables.documents(s, dir))
          .select(
            col("doc_id"),
            length(col("data")).cast("long").as("byte_len"),
            md5(col("data")).as("content_md5"),
            col("source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |  md5(text) AS content_md5, source
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // The mapPartitions decode path, verified against the stub's
    // arithmetic replicated in SQL.
    EngineQuery(
      "multimodal_features",
      (s, dir) =>
        extractFeatures(asMediaTable(Tables.documents(s, dir))).orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |  64 + octet_length(encode(text)) % 576 AS width,
             |  64 + (octet_length(encode(text)) * 7) % 448 AS height,
             |  1 + octet_length(encode(text)) % 30 AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // Perceptual-hash near-dup: the stripe/parity/band arithmetic of
    // the mapPartitions signature replicated per code point in SQL,
    // missing bands completed to 0, the same cap + band join + Hamming
    // verify — end-to-end independent replay. The injected Hamming-1
    // twin cohort guarantees the gate emits pairs at every SF (r16 —
    // previously it passed on 0 = 0 rows).
    EngineQuery(
      "media_phash_neardup",
      (s, dir) =>
        phashNearDupPairs(asMediaTable(
          withNearDupMediaCohort(Tables.documents(s, dir))))
          .orderBy("doc_a", "doc_b"),
      Some {
        val pivots = (0 until 4)
          .map(b => s"max(CASE WHEN band_idx = $b THEN band_val END) AS b$b")
          .mkString(", ")
        val hamming = (0 until 4)
          .map(b => s"bit_count(xor(a.b$b, b.b$b))")
          .mkString(" + ")
        s"""WITH $duckNearDupMediaDocs,
           |cps AS (
           |  SELECT doc_id, CAST(p AS BIGINT) AS p,
           |    ord(substr(text, CAST(p AS INT), 1)) AS v,
           |    CAST(length(text) AS BIGINT) AS n
           |  FROM media_docs, unnest(generate_series(1, length(text))) g(p)
           |  WHERE length(text) > 0),
           |stripes AS (
           |  SELECT doc_id, ((p - 1) * 64) // n AS stripe,
           |    CAST(sum(v) AS BIGINT) AS sv
           |  FROM cps GROUP BY doc_id, ((p - 1) * 64) // n),
           |bands0 AS (
           |  SELECT doc_id, CAST(stripe // 16 AS BIGINT) AS band_idx,
           |    CAST(sum((sv % 2) << (stripe % 16)) AS BIGINT) AS band_val
           |  FROM stripes GROUP BY doc_id, stripe // 16),
           |b4 AS (
           |  SELECT DISTINCT doc_id, b AS band_idx
           |  FROM stripes, unnest(generate_series(0, 3)) g(b)),
           |bands AS (
           |  SELECT b4.doc_id, b4.band_idx,
           |    coalesce(bands0.band_val, 0) AS band_val
           |  FROM b4 LEFT JOIN bands0 USING (doc_id, band_idx)),
           |sig AS (SELECT doc_id, $pivots FROM bands GROUP BY doc_id),
           |kept AS (SELECT band_idx, band_val FROM bands
           |  GROUP BY 1, 2 HAVING count(*) <= 100),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM bands x JOIN bands y
           |    ON x.band_idx = y.band_idx AND x.band_val = y.band_val
           |  JOIN kept k ON x.band_idx = k.band_idx AND x.band_val = k.band_val
           |  WHERE x.doc_id < y.doc_id)
           |SELECT c.doc_a, c.doc_b, CAST($hamming AS BIGINT) AS hamming
           |FROM cand c JOIN sig a ON a.doc_id = c.doc_a
           |JOIN sig b ON b.doc_id = c.doc_b
           |WHERE $hamming <= 3
           |ORDER BY doc_a, doc_b""".stripMargin
      },
    ),
    // The mapPartitions resize path: decode → fit-within-224 integer
    // resample, both stub arithmetics replicated exactly in SQL.
    EngineQuery(
      "media_resize_stats",
      (s, dir) =>
        resizeFeatures(asMediaTable(Tables.documents(s, dir))).orderBy("doc_id"),
      Some("""WITH f AS (SELECT doc_id,
             |  64 + octet_length(encode(text)) % 576 AS width,
             |  64 + (octet_length(encode(text)) * 7) % 448 AS height
             |  FROM documents),
             |r AS (SELECT doc_id, width, height,
             |  CASE WHEN greatest(width, height) <= 224 THEN width
             |       ELSE greatest(1, width * 224 // greatest(width, height)) END AS out_w,
             |  CASE WHEN greatest(width, height) <= 224 THEN height
             |       ELSE greatest(1, height * 224 // greatest(width, height)) END AS out_h
             |  FROM f)
             |SELECT doc_id, width, height, out_w, out_h,
             |  out_w * out_h * 3 AS out_bytes
             |FROM r ORDER BY doc_id""".stripMargin),
    ),
  )
}
