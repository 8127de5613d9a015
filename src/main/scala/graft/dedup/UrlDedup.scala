package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{EngineQuery, Tables}

/** Canonical-URL deduplication — the cheapest rung of the dedup ladder
  * and the FIRST pass a real crawl pipeline runs (CommonCrawl-style
  * pipelines drop the bulk of refetches here before any content hashing
  * or MinHash): the same page arrives under many textually-distinct
  * URLs (case-shifted scheme/host, tracking parameters, default ports,
  * trailing slashes, fragments, reordered query strings, %-encoding
  * spellings), and plain string normalization + one aggregation
  * collapses them without touching the document body.
  *
  * Canonicalization rule (each step expressible in both engines' string
  * functions — no UDF, everything stays inside whole-stage codegen):
  *   1. drop the fragment (`#...` — client-side only);
  *   2. normalize percent-encoding over everything after the scheme
  *      (RFC 3986 §6.2.2.1-2): uppercase the hex digits of every
  *      escape, and DECODE escapes of unreserved characters
  *      (`%41`→`A`, `%7E`→`~` — ALPHA / DIGIT / `-` / `.` / `_` / `~`).
  *      Reserved characters stay encoded (decoding `%2F` would change
  *      the path structure), so the authority/path/query split below is
  *      unaffected — this is the biggest false-negative class on real
  *      crawl URL lists, where the same path arrives in both spellings;
  *   3. lowercase scheme and host:port (case-insensitive per RFC 3986
  *      §3.2.2); userinfo (`user:pass@`) is case-SENSITIVE and passes
  *      through untouched;
  *   4. drop the default port (`:443` for https, `:80` for http);
  *   5. strip a trailing slash from the path (root `/` and empty both
  *      canonicalize to empty);
  *   6. drop tracking parameters (`utm_*`, `fbclid`, `gclid`), sort the
  *      survivors lexicographically, rejoin (param order never changes
  *      page identity).
  * Inputs without a `scheme://` prefix pass through UNCHANGED (the
  * guard that keeps the canonical form a fixed point on arbitrary
  * strings — a scheme-less input used to grow a spurious `://`).
  *
  * The harness corpus carries no URL column, so deterministic synthetic
  * URLs derive from doc metadata (the twin-cohort convention the media
  * phash gate uses): `page = doc_id div 3` keys ~3 docs to one page,
  * and `doc_id % 3` picks which messy variant of that page's URL the
  * doc carries — clean, case-shifted + tracking + fragment + trailing
  * slash + %-encoded unreserved bytes (`%61`→`a`, `%6f`→`o`), or
  * default-port + reordered params + lowercase-hex reserved escape
  * (`a%2fb` vs `a%2Fb`). All three canonicalize identically, so the
  * gate exercises nonzero dup groups on its positive path by
  * construction AND binds on both halves of the %-normalization rule.
  *
  * Scale shape (100 TB): canonicalization is pure map-side column work;
  * the only exchange is the one hash aggregation on canonical_url (plus
  * a window PARTITIONED on canonical_url for keep-best — group sizes
  * are refetch counts, never corpus-scale, so no single-partition
  * sort). Keep-best follows [[Dedup.dedupApplyBest]]: highest quality
  * (n_chars) wins, ties to the smallest doc_id.
  */
object UrlDedup {

  /** Percent-encoding normalization as a pure column expression
    * (rule 2 above). Split on `%`: every element after the first
    * starts with what should be two hex digits — uppercase them, and
    * when they encode an unreserved character, decode. Malformed
    * escapes (`%4`, `%zz`, a bare trailing `%`) pass through
    * byte-identically. `split` with limit -1 keeps trailing empty
    * elements, so a URL ending in `%` round-trips. Decoded characters
    * are unreserved (never `%`, never a delimiter), so the result is a
    * fixed point and the authority/path/query structure is preserved.
    */
  private def pctNormalize(s: Column): Column = {
    val parts = split(s, "%", -1)
    def decodePiece(p: Column): Column = {
      val h = upper(substring(p, 1, 2))
      val isHex = h.rlike("^[0-9A-F]{2}$")
      val code = conv(h, 16, 10).cast("int")
      val tail = substring(p, 3, 1000000)
      val unreserved = (code >= 48 && code <= 57) || (code >= 65 && code <= 90) ||
        (code >= 97 && code <= 122) || code === 45 || code === 46 ||
        code === 95 || code === 126
      when(!isHex, concat(lit("%"), p))
        .when(unreserved, concat(call_function("char", code), tail))
        .otherwise(concat(lit("%"), h, tail))
    }
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, 2, 1000000), decodePiece(_)), ""))
  }

  /** Step-by-step canonicalization as a column expression over a raw
    * URL string column (documented rule above).
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = pctNormalize(regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
    val authRaw = regexp_extract(rest, "^([^/?#]*)", 1)
    // userinfo (through the LAST '@' — the host can't contain one) is
    // case-sensitive and survives verbatim; only host:port lowercases
    val ui = when(instr(authRaw, "@") > 0, regexp_extract(authRaw, "^(.*@)", 1))
      .otherwise(lit(""))
    val hostPort = lower(regexp_replace(authRaw, "^.*@", ""))
    val hp = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val auth = concat(ui, hp)
    // strip the RAW authority prefix (anchored replace) — computing the
    // split from length(lower(auth)) breaks when lowercasing changes
    // string length (e.g. U+0130 lowercases to two codepoints)
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    // "/+$": ALL trailing slashes strip (a single-slash strip would make
    // canon("…/a//") = "…/a/" — not a fixed point, and UrlProps pins
    // idempotence); bare "/"/"//" collapse to empty through the same rule
    val path = when(path0 === "/" || path0 === "", lit(""))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query = when(instr(pathq, "?") > 0,
        pathq.substr(instr(pathq, "?") + lit(1), lit(1000000)))
      .otherwise(lit(""))
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))),
      "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), auth, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
  }

  /** Canonical host of each doc's synthetic URL — THE definition of the
    * URL family's host scheme, shared by the host-reputation rollup
    * ([[graft.curation.Curation.hostQualityRollup]]) so host-level
    * operators can never drift from it; `UrlDedupSpec` additionally
    * ties it to [[urlCanonicalize]]'s output host.
    */
  def hostCol: Column =
    concat(lit("cdn"), expr("(doc_id div 3) % 5").cast("string"), lit(".example.com"))

  /** DuckDB twin of [[hostCol]]. */
  val duckHostExpr: String =
    "'cdn' || CAST((doc_id // 3) % 5 AS VARCHAR) || '.example.com'"

  /** Deterministic synthetic URL per doc (twin-cohort derivation — see
    * object doc): (doc_id, n_chars, url). Variant 1 spells unreserved
    * bytes as escapes (`%61rticles`, `h%6fme` — lowercase hex, so both
    * normalization halves bind); variant 2 carries the shared reserved
    * escape `q=a%2Fb` in LOWERCASE hex while 0 and 1 carry it
    * uppercase — identical canonical forms only if hex case
    * normalizes without decoding the reserved byte.
    */
  def syntheticUrls(docs: DataFrame): DataFrame = {
    val page = expr("doc_id div 3").cast("string")
    val hostN = expr("(doc_id div 3) % 5").cast("string")
    val url = when(col("doc_id") % 3 === 0,
        concat(lit("https://cdn"), hostN, lit(".example.com/articles/p"), page,
          lit("?id="), page, lit("&ref=home&q=a%2Fb")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("HTTPS://CDN"), hostN, lit(".Example.COM/%61rticles/p"), page,
          lit("/?utm_source=feed&id="), page, lit("&ref=h%6fme&q=a%2Fb#frag")))
      .otherwise(
        concat(lit("https://cdn"), hostN, lit(".example.com:443/articles/p"), page,
          lit("?ref=home&q=a%2fb&id="), page))
    docs.select(col("doc_id"), col("n_chars"), url.as("url"))
  }

  /** The map-stage half as its own relation: (doc_id, url,
    * canonical_url) — the scalar rule the grouping below relies on,
    * gated standalone so a canonicalization regression is attributed to
    * the rule, not the aggregation.
    */
  def urlCanonicalize(docs: DataFrame): DataFrame =
    syntheticUrls(docs)
      .select(col("doc_id"), col("url"), canonicalizeUrl(col("url")).as("canonical_url"))

  /** Group + keep-best: one row per canonical URL with its refetch
    * count and the kept doc (max n_chars, ties to min doc_id — the
    * [[Dedup.dedupApplyBest]] rule). Window partitioned BY the group
    * key — bounded partitions, no global sort.
    */
  def urlDedupGroups(docs: DataFrame): DataFrame = {
    val canon = syntheticUrls(docs)
      .select(col("doc_id"), col("n_chars"), canonicalizeUrl(col("url")).as("canonical_url"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canonical_url")
      .orderBy(col("n_chars").desc, col("doc_id"))
    canon
      .withColumn("__rk", row_number().over(w))
      .groupBy("canonical_url")
      .agg(
        count(lit(1)).as("n_urls"),
        max(when(col("__rk") === 1, col("doc_id"))).as("kept_doc_id"))
  }

  /** Packing base for the associative keep-best aggregate: the winner
    * by (n_chars DESC, doc_id ASC) is argmax of `n_chars·T − doc_id`,
    * one exact BIGINT max — associative, so the SAME rule serves the
    * batch window, the streaming complete-mode aggregate, and the
    * incremental merge, provably picking identical winners. Domain:
    * doc_id ∈ [0, T) and n_chars < 2^63/T ≈ 9.2·10⁶ (harness doc_ids
    * stay under 10¹¹ even with probe copy offsets; n_chars is a
    * per-doc char count). The n_chars half of the domain is ENFORCED
    * ([[MaxPackChars]]): a ~9 MB document would silently overflow the
    * BIGINT lane and corrupt the winner in all three forms, so the
    * packing fails loud instead.
    */
  private val PackT = 1000000000000L

  /** Largest n_chars the packed lane admits. Deliberately 9.0·10⁶, not
    * the exact 2^63/PackT ≈ 9.22·10⁶ ceiling: the ~2% margin keeps the
    * max product a comfortable distance from Long.MaxValue (no
    * off-by-one reasoning at the boundary), at the cost of rejecting a
    * representable sliver nothing in a text corpus occupies — a 9 MB
    * single document is already pathological. Out-of-domain rows raise
    * instead of silently mis-picking.
    */
  private val MaxPackChars = 9000000L

  private def packedBest: Column =
    max(when(col("n_chars") >= lit(MaxPackChars),
        expr(("raise_error(concat('UrlDedup keep-best packing: n_chars ', " +
          s"CAST(n_chars AS STRING), ' is outside the packed BIGINT domain (< $MaxPackChars); ") +
          "split the keep-best rule off the packed lane for jumbo documents'))")
          .cast("long"))
      // Symmetric guard on the doc_id half of the packing domain (r18
      // ADVICE: it was comment-only — a probe/copy offset pushing
      // doc_id past 10^12 would have silently corrupted the winner;
      // negative ids would collide with the next n_chars tier the same
      // way). Both halves of the domain now fail loud.
      .when(col("doc_id") >= lit(PackT) || col("doc_id") < 0L,
        expr(("raise_error(concat('UrlDedup keep-best packing: doc_id ', " +
          s"CAST(doc_id AS STRING), ' is outside the packed BIGINT domain [0, $PackT); ") +
          "re-key the corpus or split the keep-best rule off the packed lane'))")
          .cast("long"))
      .otherwise(col("n_chars") * lit(PackT) - col("doc_id")))

  /** Inverse of the packing over the aggregated `__p` column:
    * doc_id = ceil(m/T)·T − m.
    */
  private def unpackedKeptDocId: Column =
    expr(s"((__p + ${PackT - 1}) div $PackT) * $PackT - __p").as("kept_doc_id")

  /** Streaming twin — the crawl-ingest shape: documents arrive as a
    * stream, canonicalize in the map stage, and a complete-mode
    * aggregate maintains one row per canonical URL (count + packed
    * keep-best). State is bounded by DISTINCT canonical URLs, not
    * stream volume, and the packed max makes keep-best associative
    * across microbatches — draining the finite gate corpus must equal
    * the batch [[urlDedupGroups]] exactly (same oracle).
    */
  def runStreamingUrlDedup(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val src = graft.sources.StreamingSources.docSource(spark, sfDir)
    val canon = syntheticUrls(src)
      .select(col("doc_id"), col("n_chars"), canonicalizeUrl(col("url")).as("canonical_url"))
    val agg = canon.groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"), packedBest.as("__p"))
    val qn = synchronized { sinkCounter += 1; s"graft_url_dedup_sink_$sinkCounter" }
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qn)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn)
      .select(col("canonical_url"), col("n_urls"), unpackedKeptDocId)
  }

  private var sinkCounter = 0

  /** Incremental fold of a NEW crawl batch into an existing canonical
    * index — the index-probe form every other dedup family carries:
    * both sides reduce to (canonical_url, n_urls, packed best), merge
    * by full-outer join with count addition and packed max (keep-best
    * is associative under the packing), unpack once. Incremental ≡
    * full recompute is the gate (the oracle is the batch SQL verbatim,
    * the [[Dedup.incrementalComponents]] convention).
    */
  def urlDedupIncremental(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def groups(d: DataFrame): DataFrame =
      syntheticUrls(d)
        .select(col("doc_id"), col("n_chars"), canonicalizeUrl(col("url")).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_urls"), packedBest.as("__p"))
    groups(oldDocs).select(col("canonical_url"), col("n_urls").as("__na"), col("__p").as("__pa"))
      .join(
        groups(newDocs).select(col("canonical_url"), col("n_urls").as("__nb"), col("__p").as("__pb")),
        Seq("canonical_url"), "full_outer")
      .select(
        col("canonical_url"),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L))).as("n_urls"),
        greatest(coalesce(col("__pa"), lit(Long.MinValue)),
          coalesce(col("__pb"), lit(Long.MinValue))).as("__p"))
      .select(col("canonical_url"), col("n_urls"), unpackedKeptDocId)
  }

  // ---- oracles ------------------------------------------------------

  /** DuckDB twin of [[pctNormalize]] over a SQL string expression:
    * identical split-on-`%` + per-piece CASE, lambdas instead of
    * higher-order Columns. The hex value computes positionally
    * (strpos over the hex alphabet) — DuckDB has no `conv`.
    */
  private def duckPctNormalize(e: String): String = {
    val hexd = "0123456789ABCDEF"
    val h = "upper(substr(p, 1, 2))"
    val code = s"((strpos('$hexd', substr($h, 1, 1)) - 1) * 16" +
      s" + strpos('$hexd', substr($h, 2, 1)) - 1)"
    val unres = s"(($code BETWEEN 48 AND 57) OR ($code BETWEEN 65 AND 90)" +
      s" OR ($code BETWEEN 97 AND 122) OR $code IN (45, 46, 95, 126))"
    s"(string_split($e, '%')[1] || array_to_string(list_transform(" +
      s"string_split($e, '%')[2:], p -> " +
      s"CASE WHEN NOT regexp_matches($h, '^[0-9A-F]{2}$$') THEN '%' || p " +
      s"WHEN $unres THEN chr(CAST($code AS INTEGER)) || substr(p, 3) " +
      s"ELSE '%' || $h || substr(p, 3) END), ''))"
  }

  /** DuckDB twin of [[syntheticUrls]] + [[canonicalizeUrl]] as a CTE
    * list ending in `canon(doc_id, n_chars, url, canonical_url)`.
    */
  private lazy val duckCanonCtes: String =
    s"""u AS (
       |  SELECT doc_id, n_chars,
       |    CASE doc_id % 3
       |      WHEN 0 THEN 'https://cdn' || CAST((doc_id // 3) % 5 AS VARCHAR) ||
       |        '.example.com/articles/p' || CAST(doc_id // 3 AS VARCHAR) ||
       |        '?id=' || CAST(doc_id // 3 AS VARCHAR) || '&ref=home&q=a%2Fb'
       |      WHEN 1 THEN 'HTTPS://CDN' || CAST((doc_id // 3) % 5 AS VARCHAR) ||
       |        '.Example.COM/%61rticles/p' || CAST(doc_id // 3 AS VARCHAR) ||
       |        '/?utm_source=feed&id=' || CAST(doc_id // 3 AS VARCHAR) || '&ref=h%6fme&q=a%2Fb#frag'
       |      ELSE 'https://cdn' || CAST((doc_id // 3) % 5 AS VARCHAR) ||
       |        '.example.com:443/articles/p' || CAST(doc_id // 3 AS VARCHAR) ||
       |        '?ref=home&q=a%2fb&id=' || CAST(doc_id // 3 AS VARCHAR)
       |    END AS url
       |  FROM documents),
       |parts AS (
       |  SELECT doc_id, n_chars, url,
       |    lower(regexp_extract(regexp_replace(url, '#.*$$', ''), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    ${duckPctNormalize("regexp_replace(regexp_replace(url, '#.*$', ''), '^[A-Za-z][A-Za-z0-9+.-]*://', '')")} AS rest
       |  FROM u),
       |parts2 AS (
       |  SELECT *, regexp_extract(rest, '^([^/?#]*)', 1) AS auth_raw,
       |    regexp_replace(rest, '^[^/?#]*', '') AS pathq
       |  FROM parts),
       |parts2b AS (
       |  SELECT *,
       |    CASE WHEN strpos(auth_raw, '@') > 0 THEN regexp_extract(auth_raw, '^(.*@)', 1)
       |         ELSE '' END AS ui,
       |    lower(regexp_replace(auth_raw, '^.*@', '')) AS hostport
       |  FROM parts2),
       |parts3 AS (
       |  SELECT *,
       |    ui || (CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |         ELSE hostport END) AS auth,
       |    regexp_extract(pathq, '^([^?]*)', 1) AS path0,
       |    CASE WHEN strpos(pathq, '?') > 0 THEN substr(pathq, strpos(pathq, '?') + 1)
       |         ELSE '' END AS query
       |  FROM parts2b),
       |canon AS (
       |  SELECT doc_id, n_chars, url,
       |    CASE WHEN scheme = '' THEN url ELSE
       |    scheme || '://' || auth ||
       |    (CASE WHEN path0 = '/' OR path0 = '' THEN ''
       |          ELSE regexp_replace(path0, '/+$$', '') END) ||
       |    (CASE WHEN array_to_string(list_sort(list_filter(string_split(query, '&'),
       |            p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=|$$)'))), '&') = ''
       |          THEN ''
       |          ELSE '?' || array_to_string(list_sort(list_filter(string_split(query, '&'),
       |            p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=|$$)'))), '&') END)
       |    END AS canonical_url
       |  FROM parts3)""".stripMargin

  /** The group+keep-best oracle — shared verbatim by the batch gate,
    * the streaming twin, and the incremental fold (the "three forms,
    * one truth" convention).
    */
  private val duckGroupsSql: String =
    s"""WITH $duckCanonCtes,
       |r AS (SELECT canonical_url, doc_id,
       |    row_number() OVER (PARTITION BY canonical_url ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM canon),
       |g AS (SELECT canonical_url, count(*) AS n_urls FROM canon GROUP BY 1)
       |SELECT g.canonical_url, g.n_urls, r.doc_id AS kept_doc_id
       |FROM g JOIN r ON g.canonical_url = r.canonical_url AND r.rk = 1
       |ORDER BY g.canonical_url""".stripMargin

  val engineQueries: Seq[EngineQuery] = Seq(
    EngineQuery(
      "url_canonicalize",
      (s, dir) => urlCanonicalize(Tables.documents(s, dir)).orderBy("doc_id"),
      Some(
        s"""WITH $duckCanonCtes
           |SELECT doc_id, url, canonical_url FROM canon ORDER BY doc_id""".stripMargin),
    ),
    EngineQuery(
      "url_dedup_groups",
      (s, dir) => urlDedupGroups(Tables.documents(s, dir)).orderBy("canonical_url"),
      Some(duckGroupsSql),
      headline = true,
    ),
    // Streaming twin: complete-mode canonical-URL state drained over the
    // finite gate corpus must equal the batch rollup (same oracle).
    EngineQuery(
      "streaming_url_dedup",
      (s, dir) => runStreamingUrlDedup(s, dir).orderBy("canonical_url"),
      Some(duckGroupsSql),
    ),
    // Incremental fold: old/new split by doc_id parity, merged result
    // must equal the FULL recompute (same oracle verbatim).
    EngineQuery(
      "url_dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        urlDedupIncremental(
          docs.where(col("doc_id") % 2 === 0),
          docs.where(col("doc_id") % 2 =!= 0))
          .orderBy("canonical_url")
      },
      Some(duckGroupsSql),
    ),
  )
}
