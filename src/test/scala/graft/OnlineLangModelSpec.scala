package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.{KeyedUpsertSink, MaterializedAggView}
import graft.text.TextAnalysis

/** The trained language model AS a maintained materialized view — the
  * r17 view tier composed with the r18 trained tier. A unigram model
  * is a group-by count over exploded tokens, so storing the tokens in
  * a versioned keyed table (key = (doc_id, pos)) makes the MODEL an
  * incrementally-maintained (lang, w) view: new docs fold in, an
  * updated doc's superseded words RETRACT via the weighted feed, a
  * deleted position's word leaves when its count reaches zero — and
  * the frozen scorers ([[TextAnalysis.langIdWith]]) read any published
  * model version. The pin everywhere: maintained model == batch
  * retrain on the current corpus, bit-for-bit, and so do the
  * predictions through it.
  *
  * Position-key discipline (documented, and exercised below): a doc
  * update that SHRINKS its token count must tombstone its tail
  * positions — LWW replaces only the positions the new image writes.
  */
class OnlineLangModelSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("doc_id", "pos")
  private def order = Seq(col("ver"))
  private val dims = Seq("lang", "w")
  private def aggs = Seq(MaterializedAggView.AggCol("c", lit(1L)))

  private def tokenRows(docs: Seq[(Long, String, String)],
      ver: Long): DataFrame =
    docs.toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), lit(ver).as("ver"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("ver"), col("lang"), col("col").as("w"))

  private def batchModel(corpus: Seq[(Long, String, String)]): DataFrame =
    TextAnalysis.trainLangModel(
      corpus.toDF("doc_id", "lang", "text").select("lang", "text"))

  test("the unigram model maintains online: new docs fold, updates retract, shrinks tombstone; scorers read it") {
    val root = java.nio.file.Files.createTempDirectory("graft-online-lm")
    val base = root.resolve("tokens").toString
    val viewPath = root.resolve("model").toString
    val up = KeyedUpsertSink.upsertBucketedDelta(
      spark, base, keys, order, numBuckets = 4, compactAfter = 0) _
    def maintained(): Set[(String, String, Long)] =
      MaterializedAggView.read(spark, viewPath)
        .select("lang", "w", "c")
        .as[(String, String, Long)].collect().toSet
    def retrained(corpus: Seq[(Long, String, String)]): Set[(String, String, Long)] =
      batchModel(corpus).as[(String, String, Long)].collect().toSet

    // wave 1: the initial labeled corpus
    val w1 = Seq(
      (1L, "en", "the cat and the dog"),
      (2L, "de", "der hund und der hund"),
      (3L, "en", "this is the cat"))
    up(tokenRows(w1, 1L), 0L)
    MaterializedAggView.bootstrap(
      spark, base, viewPath, keys, order, dims, aggs)
    assert(maintained() == retrained(w1),
      "bootstrapped model must equal the batch-trained one")

    // wave 2: a NEW doc folds in; doc 2 UPDATES in place (same token
    // count, different words — LWW retracts the superseded words)
    val d2v2 = (2L, "de", "das ist nicht der hund")
    val w2add = Seq((4L, "es", "el gato y el perro"))
    up(tokenRows(w2add :+ d2v2, 2L), 1L)
    MaterializedAggView.refresh(
      spark, base, viewPath, keys, order, dims, aggs)
    val corpus2 = Seq(w1(0), d2v2, w1(2)) ++ w2add
    assert(maintained() == retrained(corpus2),
      "update retraction must fold the superseded words OUT of the model")

    // wave 3: doc 3 SHRINKS from 4 tokens to 2 — upsert the surviving
    // positions, tombstone the tail (the position-key discipline)
    val d3v3 = (3L, "en", "the cat")
    up(tokenRows(Seq(d3v3), 3L), 2L)
    KeyedUpsertSink.deleteBucketedDelta(
      spark, base, keys, order, numBuckets = 4)(
      Seq((3L, 2L, 4L), (3L, 3L, 4L)).toDF("doc_id", "pos", "ver"), 3L)
    MaterializedAggView.refresh(
      spark, base, viewPath, keys, order, dims, aggs)
    val corpus3 = Seq(w1(0), d2v2, d3v3) ++ w2add
    assert(maintained() == retrained(corpus3),
      "tail tombstones must remove the shrunk doc's trailing words")
    // the fully-departed words are GONE, not zero-count rows
    assert(!maintained().exists { case (_, w, _) => w == "is" },
      "a word whose last occurrence retracted must leave the model")

    // the frozen scorers consume the MAINTAINED model directly, and
    // predict identically to one trained from scratch on the corpus
    val probe = Seq((10L, "der hund und das"), (11L, "el gato"),
      (12L, "the cat and the dog")).toDF("doc_id", "text")
    val servedModel = MaterializedAggView.read(spark, viewPath)
      .select("lang", "w", "c")
    val served = TextAnalysis.langIdWith(probe, servedModel)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val scratch = TextAnalysis.langIdWith(probe, batchModel(corpus3))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(served == scratch)
    assert(served.map(_._2) == Seq("de", "es", "en"),
      s"the maintained model must actually discriminate, got $served")
  }
}
