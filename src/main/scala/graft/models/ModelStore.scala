package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet persistence for TRAINED MODELS — the train-once / apply-many
  * deployment shape a production pipeline actually runs (a tokenizer
  * vocabulary or quality-filter weight vector is learned once on a
  * training snapshot, then swept over months of corpus batches; nothing
  * re-learns per query).
  *
  * Every learner family gates a `*_from_saved` round-trip: train →
  * [[save]] the model artifact → [[load]] it back from disk → apply the
  * LOADED artifact to the corpus — proven against the SAME DuckDB
  * oracle as the in-process twin, so the persistence layer demonstrably
  * loses nothing:
  *
  *  - `unigram_tokenize_from_saved` — the (piece, cnt) vocabulary
  *    ([[graft.text.Unigram]]);
  *  - `perceptron_confusion_from_saved` — the (bucket, weight) vector
  *    ([[graft.text.Perceptron]]);
  *  - `bpe_tokenize_from_saved` — the ordered (step, a, b) merge table
  *    ([[graft.text.Bpe]]);
  *  - `ann_ivf_from_saved` — the trained (cid, cq, cnrm) coarse
  *    centroids ([[graft.similarity.Ann]]).
  *
  * Models are small (vocabulary/bucket/centroid cardinality), so a
  * single parquet artifact per model is the right grain at any corpus
  * scale; the APPLY side stays fully distributed (broadcast attach /
  * literal weight array — each family's documented apply plan).
  */
object ModelStore {

  /** Memoized per-sfDir data fingerprint, keyed by a CHEAP per-call
    * probe (r17 ADVICE: path() is called on every exists/load/save and
    * each call re-walked every parquet table with getContentSummary;
    * r18 ADVICE: a forever-memo meant an in-place mid-session data
    * regeneration was silently not re-seen — the exact staleness the
    * fingerprint exists to catch). The probe is ONE non-recursive
    * listStatus of sfDir (name + mtime + flat length of each parquet
    * entry): if it matches the memoized probe, the expensive digest
    * (recursive content summaries of table directories) is reused;
    * any change — file replaced, table added, mtime bumped by a
    * regeneration — misses the memo and recomputes, so the artifact
    * path moves again within the same session. Table DIRECTORIES get
    * one non-recursive child listing each (name + mtime + len of every
    * part file): a POSIX in-place overwrite of an existing part file
    * bumps the FILE's mtime but not the parent dir's, so a dir-level
    * probe alone would memo-hit right through the regeneration (r19
    * review). Still O(tables) cheap RPCs per call — the expensive
    * recursive content walk remains recompute-only.
    */
  private val fingerprints =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Canonical artifact location for a model tag trained on `sfDir`.
    * The readable component is lossy (`sf_1` and `sf-1` both sanitize
    * to `sf_1`), so an md5 prefix rides alongside — of the RAW sfDir
    * string PLUS a (name, byte-size) fingerprint of every parquet
    * table under it: distinct training inputs can never share an
    * artifact directory, and regenerating the data at the same path —
    * across sessions OR in-place within one (the memo is keyed by a
    * cheap listing probe, see [[fingerprints]]) — moves the artifact
    * location, so a self-healing `*_from_saved` caller retrains
    * instead of silently applying a model trained on the old data.
    * The listing uses the Hadoop FileSystem API (as [[exists]] does),
    * so the fingerprint holds on any deployment filesystem — a
    * java.io.File walk silently returned nothing on HDFS/S3 (r17
    * ADVICE), degrading the protection to a path-only hash; if the
    * listing still comes back empty the degraded mode logs loud.
    */
  def path(tag: String, sfDir: String): String = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    // NonFatal, not just IOException (r18 ADVICE): new Path("") /
    // a relative path containing ':' throws IllegalArgumentException,
    // which the old java.io.File walk handled gracefully — malformed
    // sfDir must degrade to the path-only hash, never crash path().
    val listing: Option[Array[org.apache.hadoop.fs.FileStatus]] =
      try {
        val p = new org.apache.hadoop.fs.Path(sfDir)
        val fs = p.getFileSystem(conf)
        Some(fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName))
      } catch { case scala.util.control.NonFatal(_) => None }
    val digest = listing match {
      case Some(st) if st.nonEmpty =>
        val probe =
          st.map { s =>
            val self = s"${s.getPath.getName}:${s.getModificationTime}:${s.getLen}"
            if (!s.isDirectory) self
            else
              // one-level child listing (see scaladoc); a child-listing
              // failure degrades to the dir-level line for THIS entry,
              // and the digest below is only memoized on a healthy walk
              try {
                val p = new org.apache.hadoop.fs.Path(sfDir)
                val kids = p.getFileSystem(conf).listStatus(s.getPath)
                  .sortBy(_.getPath.getName)
                  .map(k => s"${k.getPath.getName}:${k.getModificationTime}:${k.getLen}")
                s"$self/${kids.mkString(",")}"
              } catch { case scala.util.control.NonFatal(_) => self }
          }.mkString("|")
        Option(fingerprints.get(sfDir)).filter(_._1 == probe).map(_._2).getOrElse {
          val p = new org.apache.hadoop.fs.Path(sfDir)
          val fs = p.getFileSystem(conf)
          val tables =
            try {
              st.map { s =>
                val len =
                  if (s.isDirectory) fs.getContentSummary(s.getPath).getLength
                  else s.getLen
                s"${s.getPath.getName}:$len"
              }.mkString("|")
            } catch { case scala.util.control.NonFatal(_) => "" }
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$sfDir#$tables".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(8)
          // Memoize HEALTHY digests only, keyed by the probe: a failed
          // content walk must self-heal on the next call, and a data
          // regeneration invalidates the memo by changing the probe.
          if (tables.nonEmpty) fingerprints.put(sfDir, (probe, d))
          else
            System.err.println(s"[ModelStore] content walk under $sfDir failed — " +
              "artifact staleness fingerprint degrades to a path-only hash for this call")
          d
        }
      case _ =>
        System.err.println(s"[ModelStore] no parquet tables listed under $sfDir — " +
          "artifact staleness fingerprint degrades to a path-only hash for this call")
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$sfDir#".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    }
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${graft.OutDir.base}/graft_models/${safe}_$digest/$tag"
  }

  /** Persist a model relation (overwrite — retraining replaces the
    * artifact atomically at the parquet-commit level).
    */
  def save(model: DataFrame, path: String): Unit =
    model.write.mode("overwrite").parquet(path)

  /** Whether a COMMITTED artifact sits at `path` (the parquet `_SUCCESS`
    * marker — a half-written dir from a killed save doesn't count).
    * Hadoop FS API, so the check holds on any deployment filesystem.
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Hard ceiling on artifact rows [[load]] will materialize to the
    * driver. Every model family is vocabulary/bucket/centroid bounded
    * (≤ thousands of rows by construction), so an artifact anywhere
    * near this cap is corrupt or mislabeled — fail LOUD before the
    * collect turns into a silent driver OOM.
    */
  val MaxArtifactRows = 1000000L

  /** Load a persisted model relation, materialized EAGERLY as a
    * driver-local relation (models are vocabulary/bucket/centroid
    * cardinality by construction). A lazily-scanned artifact frame
    * would read whatever bytes sit at the path when the CALLER finally
    * acts — a concurrent retrain's overwrite could cross-contaminate
    * the apply; the eager copy snapshots load-time state. Artifacts
    * over [[MaxArtifactRows]] are rejected before collecting.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    // BOUNDED guard (r17 ADVICE: a full count() re-scanned the whole
    // artifact as an extra job inside the TIMED apply half of every
    // *_from_saved bench pass): the limit stops the scan at cap+1 rows,
    // so a healthy vocabulary-sized artifact pays ~nothing and a
    // corrupt one still fails loud before the collect.
    val over = raw.limit(MaxArtifactRows.toInt + 1).count() > MaxArtifactRows
    require(!over,
      s"model artifact at $path holds more rows than the cap $MaxArtifactRows: " +
        "models are vocabulary/bucket/centroid bounded — refusing the driver collect")
    graft.Checkpoints.driverLocal(raw)
  }

  /** Save + reload in one breath — the round-trip the `*_from_saved`
    * gates run; returns the LOADED relation (never the in-memory one).
    */
  def roundTrip(model: DataFrame, path: String): DataFrame = {
    save(model, path)
    load(model.sparkSession, path)
  }
}
