package graft.models

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The trained-model persistence round-trips: every `*_from_saved`
  * gate applies a model RELOADED from parquet and must equal its
  * in-process twin exactly (the deployment invariant — a model that
  * changes behavior across a save/load cycle is corrupt).
  */
class ModelStoreSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: scala.collection.Seq[_] => a.toList
      case x => x
    }.toList).toList

  test("roundTrip preserves rows and schema through parquet (incl. array columns)") {
    import spark.implicits._
    val model = Seq((1L, Seq(3L, 1L, 2L)), (2L, Seq(9L)))
      .toDF("cid", "cq")
    val back = ModelStore.roundTrip(model, ModelStore.path("spec_rt", sfDir))
    // parquet widens nullability flags; names and types must hold
    back.schema.map(f => (f.name, f.dataType.catalogString)) shouldBe
      model.schema.map(f => (f.name, f.dataType.catalogString))
    rows(back.orderBy("cid")) shouldBe rows(model.orderBy("cid"))
  }

  test("unigram: tokenize from the reloaded vocab equals the in-process apply") {
    val docs = graft.Tables.documents(spark, sfDir)
    val direct = rows(graft.text.Unigram.unigramTokenizeStats(docs).orderBy("doc_id"))
    // explicit setup half first (fresh train+persist), then the apply
    // half — the exact split the bench measures (r16 verdict item 4)
    graft.text.Unigram.trainAndSaveVocab(spark, sfDir)
    val saved = rows(graft.text.Unigram.tokenizeStatsFromSaved(spark, sfDir).orderBy("doc_id"))
    saved should not be empty
    saved shouldBe direct
  }

  test("perceptron: confusion from the reloaded weights equals the in-process apply") {
    val docs = graft.Tables.documents(spark, sfDir)
    val direct = rows(graft.text.Perceptron.confusion(docs).orderBy("y", "pred"))
    graft.text.Perceptron.trainAndSaveWeights(spark, sfDir)
    val saved = rows(graft.text.Perceptron.confusionFromSaved(spark, sfDir).orderBy("y", "pred"))
    saved should not be empty
    saved shouldBe direct
  }

  test("bpe: tokenize from the reloaded merge table equals the in-process apply") {
    val docs = graft.Tables.documents(spark, sfDir)
    val direct = rows(graft.text.Bpe.bpeTokenizeStats(docs).orderBy("doc_id"))
    graft.text.Bpe.trainAndSaveMerges(spark, sfDir)
    val saved = rows(graft.text.Bpe.tokenizeStatsFromSaved(spark, sfDir).orderBy("doc_id"))
    saved should not be empty
    saved shouldBe direct
  }

  test("load refuses an artifact past the row cap (fail loud, not driver OOM)") {
    // ADVICE r16: models are bounded by construction, so an oversized
    // artifact is corrupt/mislabeled — load must reject BEFORE collecting.
    val p = ModelStore.path("spec_oversized", sfDir)
    ModelStore.save(
      spark.range(ModelStore.MaxArtifactRows + 1).toDF("piece"), p)
    val e = intercept[IllegalArgumentException](ModelStore.load(spark, p))
    e.getMessage should include("cap")
    // and a sane artifact at the same path loads fine after retrain
    ModelStore.save(spark.range(3).toDF("piece"), p)
    ModelStore.load(spark, p).count() shouldBe 3L
  }

  test("staleness probe sees an in-place part-file overwrite inside a table directory (r19)") {
    // The memo probe must descend one level: a POSIX in-place overwrite
    // of an existing part file bumps the FILE's mtime but not the
    // parent dir's, so a dir-level probe memo-hits right through the
    // regeneration and path() keeps returning the artifact trained on
    // the old data. (The recompute digest is (name, byte-size), so the
    // regeneration here changes length — the realistic case; the probe
    // fix is what makes the recompute HAPPEN at all mid-session.)
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_probe").toFile
    try {
      val table = new java.io.File(dir, "documents.parquet")
      table.mkdirs()
      val part = new java.io.File(table, "part-00000.parquet")
      java.nio.file.Files.write(part.toPath, "aaaa".getBytes("UTF-8"))
      val dirM = table.lastModified()
      val p1 = ModelStore.path("spec_stale", dir.getAbsolutePath)
      // in-place regeneration: same file, new content/length/mtime;
      // parent dir mtime pinned back to its pre-overwrite value
      java.nio.file.Files.write(part.toPath, "bbbbbbbb".getBytes("UTF-8"))
      part.setLastModified(part.lastModified() + 2000L)
      table.setLastModified(dirM)
      val p2 = ModelStore.path("spec_stale", dir.getAbsolutePath)
      p2 should not be p1
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("ivf: search against the reloaded centroid artifact equals the in-process search") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val direct = rows(
      graft.similarity.Ann.ivfTrainedTopK(emb, emb.where(col("vec_id") < 50), k = 3)
        .orderBy("q_id", "rank"))
    graft.similarity.Ann.trainAndSaveIvf(spark, sfDir)
    val saved = rows(
      graft.similarity.Ann.ivfTopKFromSaved(spark, sfDir, k = 3)
        .orderBy("q_id", "rank"))
    saved should not be empty
    saved shouldBe direct
  }
}
