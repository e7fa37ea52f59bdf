package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Behavioral tests for the dedup / similarity / text operators: planted
  * duplicates must be found; exact formulations must agree.
  */
class DedupSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base =
    "spark shuffles data between stages when a wide dependency requires it " +
      "and the optimizer prunes columns before the scan begins"

  test("minhashNearDups finds planted near-duplicates, not unrelated docs") {
    val docs = Seq(
      (1L, base),
      (2L, base + " today"),                           // near-dup of 1
      (3L, base.replace("spark", "flink")),            // near-dup of 1
      (4L, "completely different text about cooking pasta with garlic and olive oil for dinner guests tonight"),
      (5L, "yet another unrelated document mentioning mountains rivers forests and long hiking trails in autumn"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, k = 2, threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val groups = Dedup.exact(docs)
      .select("keep_doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("simhashNearDups flags hamming<=3 pairs only") {
    val docs = Seq(
      (1L, base), (2L, base + " x"),
      (3L, "an entirely distinct corpus entry regarding medieval architecture and stone bridges"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 8)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("128-bit simhash: word0 equals the 64-bit signature; banding is exhaustive for hamming<=3") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    // w0 votes on the same md5 hex 1-16 bits as the 64-bit kernel
    val mismatch = docs.select(
      Dedup.simhash(col("text")).as("s64"),
      element_at(Dedup.simhashWide(col("text")), 1).as("w0"))
      .filter(col("s64") =!= col("w0")).count()
    assert(mismatch == 0)
    // pigeonhole: the banded candidate stage must find EVERY pair at
    // hamming <= 3 (4 bands, <=3 flipped bits can't touch all 4)
    val sigs = docs.select(col("doc_id"),
      Dedup.simhashWide(col("text")).as("sw"))
      .select(col("doc_id"),
        element_at(col("sw"), 1).as("w0"), element_at(col("sw"), 2).as("w1"))
    val a = sigs.select(col("doc_id").as("doc_id_a"), col("w0").as("w0a"), col("w1").as("w1a"))
    val b = sigs.select(col("doc_id").as("doc_id_b"), col("w0").as("w0b"), col("w1").as("w1b"))
    val brute = a.crossJoin(b).filter(col("doc_id_a") < col("doc_id_b"))
      .withColumn("hamming",
        (bit_count(col("w0a").bitwiseXOR(col("w0b"))) +
          bit_count(col("w1a").bitwiseXOR(col("w1b")))).cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_id_a", "doc_id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val banded = Dedup.simhashNearDups(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute)
  }

  test("embeddingNearDupsLsh: verified subset of exact pairs; planted duplicates always found") {
    val emb = Tables.embeddings(spark, Sf0001)
    // plant exact duplicates: a copy of every vector under a shifted id —
    // identical vectors share every band, so all (i, i+1000) pairs MUST
    // surface with cosine 1.0
    val planted = emb.unionByName(
      emb.select((col("vec_id") + 1000L).as("vec_id"), col("embedding"), col("label")))
    val got = Similarity.embeddingNearDupsLsh(planted, threshold = 0.99)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    val ids = emb.select("vec_id").as[Long].collect()
    ids.foreach(i => assert(got.contains((i, i + 1000L)),
      s"planted duplicate pair ($i, ${i + 1000L}) missed"))
    // soundness: every emitted pair really is >= threshold per the exact
    // label-free all-pairs computation
    val lsh = Similarity.embeddingNearDupsLsh(emb, threshold = 0.3)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    val x = emb.select(col("vec_id").as("vec_id_a"), col("embedding").as("ea"),
      Similarity.fnorm(col("embedding")).as("na"))
    val y = emb.select(col("vec_id").as("vec_id_b"), col("embedding").as("eb"),
      Similarity.fnorm(col("embedding")).as("nb"))
    val exact = x.crossJoin(y).filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos", Similarity.cosineWithNorms(col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.3)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH emitted a pair below the exact threshold")
  }

  test("embeddingDecontaminate: sound (subset of exact hits); finds planted bench copy") {
    val emb = Tables.embeddings(spark, Sf0001)
    val bench = emb.filter(col("vec_id") % 37 === 0)
    val corpus = emb.filter(col("vec_id") % 37 =!= 0)
      // plant an exact copy of a benchmark vector in the corpus
      .unionByName(bench.limit(1).select((col("vec_id") + 1000000L).as("vec_id"),
        col("label"), col("embedding")))
    val flagged = Similarity.embeddingDecontaminate(corpus, bench, threshold = 0.3)
      .select("vec_id", "n_benchmark_hits").as[(Long, Long)].collect().toMap
    // the planted copy collides in every band and scores cosine 1.0
    assert(flagged.contains(1000000L + bench.select(min("vec_id")).as[Long].head()))
    // soundness: every flagged vector has a true exact-cosine hit
    val exact = corpus.select(col("vec_id"), col("embedding").as("ea"),
        Similarity.fnorm(col("embedding")).as("na"))
      .crossJoin(broadcast(bench.select(col("vec_id").as("bid"),
        col("embedding").as("eb"), Similarity.fnorm(col("embedding")).as("nb"))))
      .withColumn("cos", Similarity.cosineWithNorms(col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.3)
      .groupBy("vec_id").count()
      .as[(Long, Long)].collect().toMap
    flagged.foreach { case (v, hits) =>
      assert(exact.contains(v), s"flagged $v has no exact benchmark hit")
      assert(hits <= exact(v), s"flagged $v counts more hits than exist")
    }
  }

  test("embeddingClusters: pair endpoints share a cluster; survivors are cluster minima") {
    val emb = Tables.embeddings(spark, Sf0001)
    val clusters = Similarity.embeddingClusters(emb)
      .as[(Long, Long)].collect().toMap
    // every corpus vector is labeled, singletons by themselves
    assert(clusters.size == emb.count())
    // every verified near-dup pair's endpoints carry the same cluster id
    val pairs = Similarity.embeddingNearDupsLsh(emb)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the min member; survivors are exactly the minima
    val members = clusters.groupBy(_._2).view.mapValues(_.keys.min).toMap
    members.foreach { case (cid, minMember) => assert(cid == minMember) }
    val survivors = Similarity.embeddingDedupSurvivors(emb)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == clusters.values.toSet)
  }

  test("ivfTopK with Lloyd training returns valid ranked top-k with real recall") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 8)
    val out = Similarity.ivfTopK(emb, q, k = 5, nprobe = 2, lloydIters = 2)
      .orderBy("query_id", "rnk").collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to rows.length))
      val cosines = rows.map(_.getAs[Double]("cosine"))
      assert(cosines.sameElements(cosines.sorted.reverse))
    }
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall > 0.2, s"IVF recall $recall too low for nprobe=2")
  }

  test("ivfTopKUnlabeled trains without a label column and keeps real recall") {
    // the unlabeled-pretraining-corpus path: no label column exists at all
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    assert(!emb.columns.contains("label"))
    val q = emb.filter(col("vec_id") < 8)
    val out = Similarity.ivfTopKUnlabeled(emb, q, k = 5, nprobe = 2,
      lloydIters = 2, kCentroids = 8)
      .orderBy("query_id", "rnk").collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to rows.length))
      val cosines = rows.map(_.getAs[Double]("cosine"))
      assert(cosines.sameElements(cosines.sorted.reverse))
    }
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall > 0.2, s"unlabeled IVF recall $recall too low for nprobe=2")
  }

  test("bruteForceTopK returns k nearest with rank 1 = highest cosine") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rnk").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse)) // descending
  }

  test("hardNegatives returns only cross-label neighbors, nearest first") {
    val emb = Tables.embeddings(spark, Sf0001)
    val out = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0), k = 3)
      .orderBy("rnk").collect()
    assert(out.length == 3)
    out.foreach(r => assert(
      r.getAs[Any]("query_label") != r.getAs[Any]("neighbor_label")))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse))
    // the hardest negative can never beat the overall nearest neighbor
    val best = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 1)
      .collect().head.getAs[Double]("cosine")
    assert(cosines.head <= best + 1e-12)
  }

  test("zero vectors get NULL cosine instead of killing the job (ANSI /0 guard)") {
    val emb = Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(0f, 0f), 1), (2L, Seq(0.5f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 2)
      .collect()
    assert(out.length == 2)
    val byNeighbor = out.map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("neighbor_id")).toMap
    assert(byNeighbor(1L) == 2L) // real vector ranks first; zero vector last
    assert(Similarity.embeddingNearDups(emb).collect() != null) // no throw
  }

  test("LSH ANN recall against brute force is substantial") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall > 0.2, s"LSH recall $recall too low") // 16-bit sigs, 4 bands
  }

  test("semDedup prunes planted duplicate, keeps cluster minima, partitions the corpus") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val n = emb.count()
    val survivors = Similarity.semDedup(emb)
    val ids = survivors.select("vec_id").as[Long].collect().toSet
    assert(ids.size < n, "semantic dedup should prune something on this corpus")
    // a planted exact duplicate of vector 0 (new max id) must be pruned:
    // same embedding → same cluster, cosine 1.0 to an earlier vector
    val dup = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val withDup = emb.unionByName(dup)
    val ids2 = Similarity.semDedup(withDup).select("vec_id").as[Long].collect().toSet
    assert(!ids2.contains(100000L))
    // the smallest vec_id of every cluster can never be dominated
    val minPerCluster = survivors.groupBy("cluster_id").agg(min("vec_id"))
    assert(minPerCluster.count() == survivors.select("cluster_id").distinct().count())
  }

  test("sq8TopK ranking matches brute force closely (fine 8-bit grid)") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    // 255 levels per dim ⇒ quantization error ≪ neighbor gaps
    assert(recall >= 0.8, s"sq8 recall $recall too low")
  }

  test("pqTopK: 4-byte codes rank true neighbors far above chance") {
    // sf0.01, not sf0.001: PQ needs enough vectors to train 16-centroid
    // codebooks, and a 500-candidate pool makes the chance baseline 2%
    // instead of 20% — the recall number means something here. This
    // corpus is near-isotropic (avg pairwise cosine ~0.003), PQ's
    // documented worst case, so the floor is chance-relative: measured
    // recall@10 of the true top-5 is ~0.23 ≈ 11× chance.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").drop("label")
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.15, s"PQ recall@10 $recall within noise of the 2% chance floor")
    // ranks are a valid contiguous 1..n per query
    val ranks = Similarity.pqTopK(emb, q, k = 10).groupBy("query_id")
      .agg(min("rnk").as("lo"), max("rnk").as("hi"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    ranks.foreach { case (_, lo, hi, n) => assert(lo == 1L && hi == n) }
  }

  test("clusterBalancedSample enforces per-cluster quotas deterministically") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val n = emb.count()
    val s1 = Similarity.clusterBalancedSample(emb, perCluster = 4)
    val rows = s1.collect()
    // quota: no cluster exceeds 4
    val perCluster = rows.groupBy(_.getAs[Long]("cluster_id")).view.mapValues(_.length)
    perCluster.foreach { case (c, cnt) => assert(cnt <= 4, s"cluster $c quota broken") }
    // sample ⊆ corpus, deterministic across invocations
    val ids1 = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(ids1.size == rows.length && ids1.size <= n)
    val ids2 = Similarity.clusterBalancedSample(emb, perCluster = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids1 == ids2)
    // raising the quota to the corpus size returns every vector
    assert(Similarity.clusterBalancedSample(emb, perCluster = n.toInt).count() == n)
  }

  test("PQ with a full-width refine window equals brute force exactly") {
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val q = emb.filter(col("vec_id") < 8)
    val n = emb.count().toInt
    // rerank >= corpus size: ADC only orders candidates, the refine
    // re-scores every one exactly -> must reproduce the exact search,
    // cosines included
    val got = Similarity.pqTopK(emb, q, k = 5, rerank = n)
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, q, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("ivfPqTopK prunes to probed lists and agrees with full PQ inside them") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").drop("label")
    val q = emb.filter(col("vec_id") < 8)
    val ivfpq = Similarity.ivfPqTopK(emb, q, k = 5).collect()
    assert(ivfpq.length == 40)
    // the coarse stage only prunes — it never re-scores: every IVF-PQ
    // result must appear in the UNPRUNED PQ ranking with the same
    // cosine (probing costs recall, never correctness of the scores)
    val full = Similarity.pqTopK(emb, q, k = emb.count().toInt)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    ivfpq.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(full.contains(key), s"$key missing from full PQ ranking")
      assert(math.abs(full(key) - r.getAs[Double]("cosine")) < 1e-12)
    }
  }

  test("chunkDocuments covers every document with the right windows") {
    val docs = Seq(
      (1L, "a" * 100),  // short: 1 chunk
      (2L, "b" * 200),  // exactly width: 1 chunk
      (3L, "c" * 201),  // width+1: second chunk starts at stride
      (4L, ""),         // empty: one empty chunk
      (5L, "d" * 500))  // 1 + ceil(300/150) = 3 chunks
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val out = TextAnalysis.chunkDocuments(docs, width = 200, stride = 150)
      .select("doc_id", "chunk_id", "chunk_len")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 100L),
      (2L, 0L, 200L),
      (3L, 0L, 200L), (3L, 1L, 51L),
      (4L, 0L, 0L),
      (5L, 0L, 200L), (5L, 1L, 200L), (5L, 2L, 200L)))
    // overlapping windows really overlap: doc 5 chunk 1 starts at 150
    val texts = TextAnalysis.chunkDocuments(docs, width = 200, stride = 150)
      .filter(col("doc_id") === 5 && col("chunk_id") === 1)
      .select("chunk_text").as[String].head()
    assert(texts == "d" * 200)
  }

  test("language id picks marker-dominant language, 'und' when none") {
    val docs = Seq(
      (1L, "der hund und die katze nicht das haus"),
      (2L, "the cat and the dog not this house"),
      (3L, "xyzzy plugh qwerty"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("token and subword counts") {
    val df = Seq(Tuple1("alpha  beta gamma")).toDF("text")
    val (nt, nsw) = df.select(
      TextAnalysis.tokenCount(col("text")).cast("long"),
      TextAnalysis.subwordCount(col("text"))).as[(Long, Long)].head()
    assert(nt == 3)
    // ceil(5/4)+ceil(4/4)+ceil(5/4) = 2+1+2
    assert(nsw == 5)
  }

  test("editDistanceNearDups: small planted edits pass, large edits are rejected") {
    val docs = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") < 50).select("doc_id", "text")
    // +4 chars (within maxDist=5) vs +21 chars (past the bound); both
    // stay shingle-near-dups, so BOTH reach the candidate stage and the
    // verdict is decided by the Levenshtein verify alone
    val close = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" zzz")).as("text"))
    val far = docs.select((col("doc_id") + 200000).as("doc_id"),
      concat(col("text"), lit(" aaaaaaaaaaaaaaaaaaaa")).as("text"))
    val pairs = Dedup.editDistanceNearDups(
        docs.unionByName(close).unionByName(far))
      .select("doc_id_a", "doc_id_b", "dist")
      .as[(Long, Long, Long)].collect()
    val set = pairs.map(p => (p._1, p._2)).toSet
    (0L until 50L).foreach(i =>
      assert(set.contains((i, i + 100000)), s"close pair $i missing"))
    assert(!pairs.exists(p => p._2 >= 200000), "far copies must be rejected")
    assert(pairs.forall(_._3 <= 5))
  }
}
