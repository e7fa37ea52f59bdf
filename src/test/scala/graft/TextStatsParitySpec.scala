package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** The single-pass TextStats kernel must agree exactly with the HOF
  * formulations it replaced, on the real corpus.
  */
class TextStatsParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("qualitySignals (kernel) equals qualitySignalsHof on every document") {
    val fast = TextAnalysis.qualitySignals(docs).orderBy("doc_id").collect()
    val slow = TextAnalysis.qualitySignalsHof(docs).orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.length == 500)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
  }

  test("langIdFast equals langId on every document") {
    val both = docs.select(
      TextAnalysis.langIdFast(col("text")).as("fast"),
      TextAnalysis.langId(col("text")).as("slow"))
      .as[(String, String)].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, s) => assert(f == s) }
  }

  test("classifierScore (kernel) equals classifierScoreHof on every document") {
    val fast = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect()
    val slow = TextAnalysis.classifierScoreHof(docs).orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.length == 500)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
    // both keep and cut classes are populated (threshold isn't degenerate)
    val kept = TextAnalysis.classifierScore(docs).filter(col("keep")).count()
    assert(kept > 0 && kept < 500)
  }

  test("classifierScore: zero-token docs get NULL score and keep=false") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "the cat sat")).toDF("doc_id", "text")
    val rows = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(!rows(0).getBoolean(rows(0).fieldIndex("keep")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("score")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("score")))
  }

  test("trainedClassifierScore: learns the planted stopword signal, is run-deterministic, gates both classes") {
    val docs = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.trainedClassifierScore(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.trainedClassifierScore(docs).orderBy("doc_id").collect()
    // bit-replayable: two independent trainings agree exactly (exact
    // decimal sums + truncating div — no float merge-order dependence)
    assert(a.length == b.length && a.length == 500)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    // the trainer actually LEARNED the target: predicted stopword
    // ratio correlates strongly with the true ratio (the md5 stand-in
    // classifier has no such relationship by construction)
    val joined = TextAnalysis.trainedClassifierScore(docs)
      .join(TextAnalysis.qualitySignals(docs)
        .select(col("doc_id"), col("stopword_ratio")), "doc_id")
      .select(corr(col("score"), col("stopword_ratio")).as("c"))
      .head().getDouble(0)
    assert(joined > 0.6, s"trained score should track the target, corr=$joined")
    // both keep and cut classes populated (threshold isn't degenerate)
    val kept = TextAnalysis.trainedClassifierScore(docs)
      .filter(col("keep")).count()
    assert(kept > 0 && kept < 500, s"kept=$kept")
  }

  test("trainedClassifierScore: zero-token docs get NULL score and keep=false") {
    val docs = Seq((1L, ""), (2L, "the the the of of and"), (3L, "qq zz xx")).toDF("doc_id", "text")
    val rows = TextAnalysis.trainedClassifierScore(docs, d = 16, rounds = 2)
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(!rows(0).getBoolean(rows(0).fieldIndex("keep")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("score")))
  }

  test("trainedLangId: beats the marker heuristic against the planted labels, is deterministic, and the frozen model decouples") {
    val docs = Tables.documents(spark, Sf0001)
    val split = col("doc_id") % 5 =!= 0
    val a = TextAnalysis.trainedLangId(docs, split).orderBy("doc_id").collect()
    val b = TextAnalysis.trainedLangId(docs, split).orderBy("doc_id").collect()
    assert(a.length == 500 && a.sameElements(b),
      "two trainings must agree exactly (all-integer scores)")
    // LEARNED: with no marker list, the trained model must match the
    // planted labels at least as well as the hand-built heuristic
    // (the corpus's own signal ceiling — both land near it)
    val joined = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.langIdFast(col("text")).as("h"))
      .join(TextAnalysis.trainedLangId(docs, split), Seq("doc_id"))
    val (trainedOk, heuristicOk) = joined.select(
      sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L)),
      sum(when(col("h") === col("lang"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    assert(trainedOk > heuristicOk,
      s"trained=$trainedOk should beat heuristic=$heuristicOk")
    assert(trainedOk > 100L, s"trained=$trainedOk must beat chance (100)")
    // frozen decoupling: train once, ship the (lang, w, c) table, score
    // elsewhere — identical to the coupled call on the same corpus
    val model = TextAnalysis.trainLangModel(docs.filter(split))
    val frozen = TextAnalysis.langIdWith(docs, model)
      .orderBy("doc_id").collect()
    assert(frozen.sameElements(a))
    // the frozen model prices UNSEEN text: known markers pull their
    // language, all-junk text still gets the least-surprising answer
    val other = Seq((1L, "der und das nicht der"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.langIdWith(other, model)
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "de",
      s"marker-dense text must score its language, got ${rows(0)}")
    assert(rows(1).getString(1) == "und", "a zero-token doc predicts und")
    // an EMPTY model predicts und everywhere (meaningless, not wrong —
    // the bigramSurprisal empty-reference contract)
    val empty = TextAnalysis.langIdWith(other,
      TextAnalysis.trainLangModel(docs.filter(lit(false))))
      .orderBy("doc_id").collect()
    assert(empty.forall(_.getString(1) == "und"))
  }

  test("langIdRowLocal streams in append mode and matches the joined scorer exactly") {
    val docs = Tables.documents(spark, Sf0001)
    val model = TextAnalysis.trainLangModel(
      docs.filter(col("doc_id") % 5 =!= 0))
    val joined = TextAnalysis.langIdWith(docs, model)
      .orderBy("doc_id").collect()
    val rowLocal = TextAnalysis.langIdRowLocal(docs, model)
      .orderBy("doc_id").collect()
    assert(joined.sameElements(rowLocal),
      "the broadcast-map decision must equal the joined plan row-for-row")
    // and the same operator runs INSIDE an append-mode streaming query
    // (row-local: no explode, no per-doc groupBy, no state)
    val root = java.nio.file.Files.createTempDirectory("graft-lid-stream")
    val landing = java.nio.file.Files.createDirectory(root.resolve("in")).toString
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$landing/w0")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$landing/w1")
    val stream = spark.readStream.schema(docs.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = TextAnalysis.langIdRowLocal(stream, model)
      .writeStream.format("memory").queryName("lid_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("lid_stream").orderBy("doc_id").collect()
    assert(streamed.sameElements(joined),
      "streamed frozen langid must equal the batch scorer row-for-row")
    // the envelope guard refuses a scale the quantization cannot carry
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.langIdRowLocal(docs, model, scale = 2L)
    }
    assert(err.getMessage.contains("scale"))
  }

  test("frozenLangGate keeps exactly the docs whose trained prediction is in the keep set") {
    val docs = Tables.documents(spark, Sf0001)
    val model = TextAnalysis.trainLangModel(
      docs.filter(col("doc_id") % 5 =!= 0))
    val keep = Set("en", "de")
    val gated = TextAnalysis.frozenLangGate(model, keep)(docs)
      .select("doc_id").as[Long].collect().toSet
    val expected = TextAnalysis.langIdWith(docs, model)
      .filter(col("lang_pred").isin(keep.toSeq: _*))
      .select("doc_id").as[Long].collect().toSet
    assert(gated == expected)
    assert(gated.nonEmpty && gated.size < 500,
      s"gate must be non-degenerate, kept ${gated.size}")
    // gating is a pure projection+filter: the input columns survive
    assert(TextAnalysis.frozenLangGate(model, keep)(docs).columns
      .sameElements(docs.columns))
    intercept[IllegalArgumentException] {
      TextAnalysis.frozenLangGate(model, Set.empty)
    }
    // the SAME gate instance (map frame built once at construction)
    // gates an append-mode stream — the claim the curation pipelines
    // rely on when the batch and streamed legs share a trained model
    val gate = TextAnalysis.frozenLangGate(model, keep)
    val root = java.nio.file.Files.createTempDirectory("graft-lgate-stream")
    val landing = java.nio.file.Files.createDirectory(root.resolve("in")).toString
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$landing/w0")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$landing/w1")
    val stream = spark.readStream.schema(docs.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = gate(stream)
      .writeStream.format("memory").queryName("lgate_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("lgate_stream").select("doc_id")
      .as[Long].collect().toSet == gated,
      "the streamed gate must keep exactly the batch gate's docs")
  }

  test("classifierScoreWith scores any corpus with frozen weights, matching the coupled trainer on its own corpus") {
    val train = Tables.documents(spark, Sf0001)
    val w = TextAnalysis.trainClassifierWeights(train)
    val coupled = TextAnalysis.trainedClassifierScore(train)
      .orderBy("doc_id").collect()
    val frozen = TextAnalysis.classifierScoreWith(train, w)
      .orderBy("doc_id").collect()
    assert(coupled.sameElements(frozen))
    // frozen weights score UNSEEN text map-side (tokens hashing into
    // untrained buckets contribute 0 — the left-join coalesce)
    val other = Seq((1L, "the of and to in"), (2L, "zzzz qqqq xxxx")).toDF("doc_id", "text")
    val rows = TextAnalysis.classifierScoreWith(other, w)
      .orderBy("doc_id").collect()
    val s1 = rows(0).getDouble(rows(0).fieldIndex("score"))
    val s2 = rows(1).getDouble(rows(1).fieldIndex("score"))
    assert(s1 > s2, s"all-stopword text must outscore junk: $s1 vs $s2")
    graft.Staging.unpin(w)
  }

  test("classifierScoreRowLocal streams in append mode and matches the batch scorer exactly") {
    val train = Tables.documents(spark, Sf0001)
    val w = TextAnalysis.trainClassifierWeights(train)
    // value parity on the batch corpus first (exact integer regrouping)
    val batch = TextAnalysis.classifierScoreWith(train, w)
      .orderBy("doc_id").collect()
    val rowLocal = TextAnalysis.classifierScoreRowLocal(train, w)
      .orderBy("doc_id").collect()
    assert(batch.sameElements(rowLocal))
    // and the same operator runs INSIDE an append-mode streaming query
    // (row-local: no shuffle, no state) over file-arrival waves
    val root = java.nio.file.Files.createTempDirectory("graft-clf-stream")
    val landing = java.nio.file.Files.createDirectory(root.resolve("in")).toString
    train.filter(col("doc_id") % 2 === 0).write.parquet(s"$landing/w0")
    train.filter(col("doc_id") % 2 === 1).write.parquet(s"$landing/w1")
    val stream = spark.readStream.schema(train.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = TextAnalysis.classifierScoreRowLocal(stream, w)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("clf_stream").orderBy("doc_id").collect()
    assert(streamed.sameElements(batch),
      "streamed frozen scoring must equal the batch scorer row-for-row")
    graft.Staging.unpin(w)
  }
}
