package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sim.{Similarity, StreamingSimilarity}

/** Streaming top-k over a growing corpus must converge to the exact
  * batch brute-force answer once the whole corpus has streamed in —
  * including across multiple micro-batches (state merge path).
  */
class StreamingSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("incremental streaming top-k converges to the batch answer across batches") {
    val emb = Tables.embeddings(spark, Sf0001)
    val total = emb.count()
    // two files -> at least two micro-batches with maxFilesPerTrigger=1
    val dir = Files.createTempDirectory("graft-simstream")
    emb.filter(col("vec_id") % 2 === 0).write
      .parquet(dir.resolve("even").toString)
    emb.filter(col("vec_id") % 2 === 1).write
      .parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def moveParts(sub: String, prefix: String): Unit = {
      val d = dir.resolve(sub)
      Files.list(d).filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.move(f, in.resolve(prefix + f.getFileName.toString))
      }
    }
    moveParts("even", "a-")
    moveParts("odd", "b-")

    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val queries = emb.filter(col("vec_id") < 8)
    val q = StreamingSimilarity.topKStream(stream, queries, k = 5)
      .toDF()
      .writeStream.format("memory").queryName("simstream_out")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    // latest snapshot per query = rows at max seen (computed driver-side:
    // the memory-sink view can't self-join)
    val rows = spark.table("simstream_out")
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("seen"))
      .as[(Long, Long, Long, Long)].collect()
    val latestSeen = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val got = rows.filter(r => r._4 == latestSeen(r._1))
      .map(r => (r._1, r._2, r._3)).toSet
    assert(latestSeen.values.max == total - 1) // whole corpus seen (minus self)

    val want = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("rnk"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("incremental near-dup candidates + verify converge to the batch LSH answer") {
    val emb = Tables.embeddings(spark, Sf0001)
    // two files -> at least two micro-batches with maxFilesPerTrigger=1,
    // so cross-batch pairs must come through the bucket STATE
    val dir = Files.createTempDirectory("graft-neardupstream")
    emb.filter(col("vec_id") % 2 === 0).write.parquet(dir.resolve("even").toString)
    emb.filter(col("vec_id") % 2 === 1).write.parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def moveParts(sub: String, prefix: String): Unit = {
      val d = dir.resolve(sub)
      val s = Files.list(d)
      try s.filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.move(f, in.resolve(prefix + f.getFileName.toString))
      } finally s.close()
    }
    moveParts("even", "a-")
    moveParts("odd", "b-")

    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamingSimilarity.nearDupCandidates(stream)
      .toDF()
      .writeStream.format("memory").queryName("neardup_cands")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    val cands = spark.table("neardup_cands")
    // emit-once discipline: no duplicate pairs across buckets or batches
    assert(cands.count() == cands.dropDuplicates("vec_id_a", "vec_id_b").count())

    // verify against the embedding store with the SHARED batch stage →
    // must equal the batch operator on the full (union) corpus exactly,
    // cosines included
    val got = Similarity.verifyNearDupCandidates(cands, emb, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val want = Similarity.embeddingNearDupsLsh(emb, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming IVF maintenance equals batch assignment; replay-safe; mass trigger fires at the bound") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val total = emb.count()
    val trained = Similarity.trainQuantizer(emb)

    val dir = Files.createTempDirectory("graft-ivfmaint")
    emb.filter(col("vec_id") % 2 === 0).write.parquet(dir.resolve("even").toString)
    emb.filter(col("vec_id") % 2 === 1).write.parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def copyParts(sub: String, prefix: String): Unit = {
      val d = dir.resolve(sub)
      val s = Files.list(d)
      try s.filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.copy(f, in.resolve(prefix + f.getFileName.toString))
      } finally s.close()
    }
    copyParts("even", "a-")
    copyParts("odd", "b-")
    copyParts("even", "c-replay-") // at-least-once: same vec_ids re-delivered

    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamingSimilarity.maintainIvfLists(stream, trained, massLimit = 50L)
      .toDF()
      .writeStream.format("memory").queryName("ivf_maint")
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("ivf_maint")
      .select(col("centroid_id"), col("vec_id"), col("list_n"), col("retrain"))
      .as[(Long, Long, Long, Boolean)].collect()

    // replay-safe: every vector admitted exactly once despite the
    // re-delivered file
    assert(rows.length.toLong == total, s"expected $total admissions, got ${rows.length}")
    assert(rows.map(_._2).distinct.length.toLong == total)

    // the maintained lists ARE the batch assignment of the union against
    // the same frozen quantizer
    val got = rows.map(r => (r._1, r._2)).toSet
    val want = Similarity
      .assignToCentroids(emb.select("vec_id", "embedding"), trained)
      .select(col("centroid_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)

    // mass trigger: every admission at/after the bound flags retrain,
    // none before it (default drift bound is disabled at -1)
    assert(rows.forall(r => r._4 == (r._3 >= 50L)))
    assert(rows.exists(_._4), "500 vectors over 8 lists must cross a 50-row bound")
  }

  test("retrain-swap loop: continuously ingested IVF index converges to batch training on the union") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val total = emb.count()
    val firstHalf = emb.filter(col("vec_id") % 2 === 0)

    val dir = Files.createTempDirectory("graft-ivfretrain")
    firstHalf.write.parquet(dir.resolve("even").toString)
    emb.filter(col("vec_id") % 2 === 1).write.parquet(dir.resolve("odd").toString)
    val in = Files.createDirectory(dir.resolve("in"))
    def copyParts(sub: String, prefix: String): Unit = {
      val d = dir.resolve(sub)
      val s = Files.list(d)
      try s.filter(_.toString.endsWith(".parquet")).forEach { f =>
        Files.copy(f, in.resolve(prefix + f.getFileName.toString))
      } finally s.close()
    }
    copyParts("even", "a-")
    copyParts("odd", "b-")
    copyParts("even", "c-replay-") // at-least-once: same vec_ids re-delivered

    // deployed index: trained on the pre-stream base (the first half);
    // massLimit 60 ⇒ 500 vectors over ≤8 initial lists must trip it
    val massLimit = 60L
    val maintainer = new StreamingSimilarity.IvfIndexMaintainer(
      dir.resolve("store").toString,
      Similarity.trainQuantizer(firstHalf),
      massLimit = massLimit)

    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in.toString)
    val q = StreamingSimilarity.ivfIngestWithRetrain(stream, maintainer)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()

    // replay-safe store: every vector exactly once despite redelivery
    assert(maintainer.store.count() == total)
    assert(maintainer.store.select("vec_id").distinct().count() == total)
    assert(maintainer.generation >= 1L, "the mass bound must have fired")

    // K grew by the nlist rule and the final retrain ran on the full
    // store, so the served index IS batch training of the union
    val kExp = math.max(8, math.ceil(2.0 * total / massLimit).toInt)
    assert(maintainer.kCentroids == kExp)
    val got = maintainer.lists
      .select("centroid_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = Similarity
      .assignToCentroids(emb, Similarity.trainQuantizer(emb, kExp))
      .select("centroid_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == want)

    // serve side: the maintained index answers queries exactly like the
    // batch unlabeled IVF over the same corpus at the same K
    val queries = emb.filter(col("vec_id") < 8)
    val served = maintainer.topK(queries, k = 5, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = Similarity.ivfTopKUnlabeled(emb, queries, k = 5,
        kCentroids = kExp, nprobe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == batch)
    assert(served.nonEmpty)
  }

  test("chaos: crash after store-append + batch replay under persist staging " +
      "always serves one consistent quantizer over the full store") {
    // the serve invariant under attack: after ANY prefix of the ingest
    // loop — including a crash in the window between the parquet append
    // and the retrain check, and an at-least-once redelivery of the same
    // batch afterwards — `lists` must be the full store assigned under
    // exactly the current quantizer generation, never a stale mix.
    // Run under `persist` staging (the cluster default for long jobs) so
    // the pins inside ingest exercise the executor-loss-recoverable path.
    def assertOneGeneration(m: StreamingSimilarity.IvfIndexMaintainer): Unit = {
      val got = m.lists.select("centroid_id", "vec_id")
        .as[(Long, Long)].collect().toSet
      val want = Similarity.assignToCentroids(
          m.store.select("vec_id", "embedding"), m.centroids)
        .select("centroid_id", "vec_id").as[(Long, Long)].collect().toSet
      assert(got == want, "served lists are not the full store under the current quantizer")
      assert(got.map(_._2).size.toLong == m.store.count(), "served lists lost store rows")
      assert(m.centroids.count() == m.kCentroids.toLong,
        "quantizer is not exactly one K-row generation")
    }
    val prevStaging = sys.props.get("graft.staging")
    sys.props("graft.staging") = "persist"
    try {
      val emb = Tables.embeddings(spark, Sf0001).drop("label")
      val batch1 = emb.filter(col("vec_id") % 2 === 0)
      val batch2 = emb.filter(col("vec_id") % 2 === 1)
      val dir = Files.createTempDirectory("graft-ivfchaos")
      val storeDir = dir.resolve("store").toString
      val massLimit = 40L
      val maintainer = new StreamingSimilarity.IvfIndexMaintainer(
        storeDir, Similarity.trainQuantizer(batch1), massLimit = massLimit)

      maintainer.ingest(batch1)
      val genAfter1 = maintainer.generation
      assertOneGeneration(maintainer)

      // CRASH SIMULATION: the ingest loop dies after step 1 (the store
      // append) and before the admission check — exactly what a killed
      // driver/executor leaves behind. The store now holds batch2 but no
      // retrain ever ran for it.
      batch2.select("vec_id", "embedding").dropDuplicates("vec_id")
        .join(maintainer.store, Seq("vec_id"), "left_anti")
        .write.mode("append").parquet(storeDir)
      assert(maintainer.generation == genAfter1, "crash must not advance the generation")
      assertOneGeneration(maintainer) // fresh rows serve under the OLD quantizer

      // RECOVERY: the at-least-once source redelivers batch2. The
      // anti-join admits nothing twice; the admission check now runs and
      // the mass bound (500 rows over the initial K=8 lists ≫ 40) trips.
      maintainer.ingest(batch2)
      val total = emb.count()
      assert(maintainer.store.count() == total, "replay duplicated store rows")
      assert(maintainer.store.select("vec_id").distinct().count() == total)
      assert(maintainer.generation > genAfter1, "recovery ingest must trip the mass bound")
      assertOneGeneration(maintainer)

      // a second redelivery after the swap: no new rows, and whatever the
      // admission check decides, the serve invariant and the pure-function
      // quantizer contract hold — training is a function of (store, K),
      // so an idempotent re-retrain cannot change the served index
      val listsBefore = maintainer.lists.select("centroid_id", "vec_id")
        .as[(Long, Long)].collect().toSet
      maintainer.ingest(batch2)
      assert(maintainer.store.count() == total, "post-swap replay duplicated store rows")
      assertOneGeneration(maintainer)
      val listsAfter = maintainer.lists.select("centroid_id", "vec_id")
        .as[(Long, Long)].collect().toSet
      assert(listsAfter == listsBefore, "post-swap replay changed the served index")
    } finally prevStaging match {
      case Some(v) => sys.props("graft.staging") = v
      case None => sys.props.remove("graft.staging")
    }
  }
}
