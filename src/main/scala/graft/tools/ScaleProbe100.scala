package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.pipeline.Curation
import graft.sim.Similarity

/** Dev-only 100× scale probe for the headline dedup/ANN/curation tier —
  * the measurement behind the 100 TB design claims (previously
  * extrapolated from [[ScaleProbe]]'s 10×).
  *
  * Corpus growth model: copy `i` of a document has every 4th token
  * replaced by a copy-specific salt token, so
  *  - cross-copy Jaccard falls to ~1/3 (below the 0.7 near-dup
  *    threshold): replicas do NOT form n² near-dup cliques;
  *  - near-dup pairs WITHIN a copy keep their original similarity (both
  *    members mutate at the same positions with the same salt), so
  *    near-dup density per document stays constant as the corpus grows —
  *    the regime where "near-linear" is even a claim one can test.
  * Embedding copies get deterministic multiplicative hash-noise per
  * (vec_id, copy, dim) — distinct vectors that keep the corpus'
  * cluster structure.
  *
  * Separately, an EXACT-copy 30× corpus (replica cliques: ~2.2M verified
  * minhash edges > the 1M `driverEdgeLimit`) drives the connected-
  * components DISTRIBUTED path on real over-bound data and asserts it
  * labels identically to the driver union-find on the same pairs.
  *
  * Corpora are synthesized once into /tmp and read back, so timings
  * measure the operators, not the synthesis. One rep per (op, scale):
  * coarse, but the quantity of interest is the growth EXPONENT across
  * two decades, not ±20% on one point.
  */
object ScaleProbe100 {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
                 else Seq(1, 10, 100)
    // second arg: "all" (default), "skew" / "cc" to run just that section
    val mode = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = "/tmp/graft-scale100"

    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val baseEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def cached(path: String)(build: => DataFrame): DataFrame = {
      if (!Files.exists(Paths.get(path)))
        build.repartition(32).write.parquet(path)
      spark.read.parquet(path)
    }

    /** Mutated-copy documents: near-dup structure constant per copy. */
    def docsAt(c: Int): DataFrame = cached(s"$tmp/docs_${c}x") {
      (0 until c).map { i =>
        val t =
          if (i == 0) col("text")
          else regexp_replace(col("text"),
            "(\\S+\\s+\\S+\\s+\\S+\\s+)\\S+", "$1u" + i + "x")
        baseDocs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          t.as("text"), col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
    }

    /** Hash-noise embedding copies: distinct vectors, same structure. */
    def embAt(c: Int): DataFrame = cached(s"$tmp/emb_${c}x") {
      (0 until c).map { i =>
        val e =
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, j) =>
            (x.cast("double") * (lit(1.0) +
              (pmod(xxhash64(concat_ws("-", col("vec_id"), lit(i), j)), lit(600))
                - 300).cast("double") / 1000.0)).cast("float"))
        baseEmb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          e.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE100 $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }

    if (mode == "all") scales.foreach { c =>
      val docs = docsAt(c)
      val emb = embAt(c).drop("label")
      val queries = embAt(1).drop("label").filter(col("vec_id") < 8)
      println(s"== scale ${c}x: ${5000L * c} docs, ${2000L * c} vectors")

      // minhash near-dup + CC clustering over its pairs (the scale path;
      // the pairs pin keeps CC's timing free of the pair stage)
      var pairs: DataFrame = null
      time(s"minhash_${c}x") {
        pairs = graft.Staging.pin(Dedup.minhashNearDups(docs)); pairs.count()
      }
      time(s"cc_${c}x")(
        Dedup.connectedComponents(docs.select("doc_id"), pairs).count())
      graft.Staging.unpin(pairs)

      time(s"curation_${c}x")(Curation.curate(
        docs, col("doc_id") % 37 === 0, minShared = 40L).count())

      // SemDeDup: K ∝ n (the operator's own contract — constant cluster
      // size keeps the within-cluster pair stage linear; training cost
      // n·K is then the quadratic-ish term a deployment shards, which
      // the probe shows honestly). IVF tiers: K ∝ √n — the canonical
      // inverted-list sizing that balances train (n·K) vs probe (n/K).
      val sqrtK = 8 * math.sqrt(c).round.toInt
      time(s"semdedup_${c}x")(
        Similarity.semDedup(emb, kCentroids = 8 * c).count())
      time(s"ivf_unlabeled_${c}x")(
        Similarity.ivfTopKUnlabeled(emb, queries, kCentroids = sqrtK).count())
      time(s"ivfpq_${c}x")(
        Similarity.ivfPqTopK(emb, queries, coarseK = sqrtK).count())

      // round-7 additions: perceptual near-dup (banded signatures),
      // substring dedup (broadcast frequent-chain index), BM25 retrieval
      // (one-pass kernel + broadcast stats row)
      time(s"mm_neardup_${c}x")(
        graft.multimodal.Multimodal.perceptualNearDups(
          graft.multimodal.Multimodal.syntheticAssets(docs)).count())
      time(s"substring_${c}x")(Dedup.substringDupSpans(docs).count())
      time(s"bm25_${c}x")(graft.text.TextAnalysis.retrievalScore(
        docs, Seq("join", "scan", "slow")).count())
    }

    // ---- ANN recall at scale: does √n-list IVF keep quality at 100×? ----
    // Latency without recall is half the story: brute force is the exact
    // oracle (8 queries × n cosines — cheap even at 200k), and recall@10
    // = |IVF top-10 ∩ exact top-10| / 10 averaged over queries.
    if (mode == "all" || mode == "recall") scales.foreach { c =>
      val emb = embAt(c).drop("label")
      val queries = embAt(1).drop("label").filter(col("vec_id") < 8)
      val sqrtK = 8 * math.sqrt(c).round.toInt
      val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        .select("query_id", "neighbor_id")
      def recall(name: String, ann: DataFrame): Unit = {
        val hit = exact.join(ann.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        val tot = exact.count()
        println(f"SCALE100 recall_${name}_${c}x ${hit.toDouble / tot}%.3f ($hit/$tot)")
      }
      recall("ivf", Similarity.ivfTopKUnlabeled(emb, queries, k = 10, kCentroids = sqrtK))
      // coarse recall is the nprobe knob: 2/K lists probed is the floor
      recall("ivf_np4", Similarity.ivfTopKUnlabeled(emb, queries, k = 10,
        kCentroids = sqrtK, nprobe = 4))
      recall("ivfpq", Similarity.ivfPqTopK(emb, queries, k = 10, coarseK = sqrtK))
      // FAISS-style refine: exact re-rank of the top-R ADC candidates —
      // the fix for PQ's resolution limit among near-identical neighbors.
      // R must exceed the duplicate-tie multiplicity (~`c` near-copies per
      // true neighbor here): R=40 < 10·c at 100× recovers only partially,
      // R=400 covers the tie set
      recall("ivfpq_rr40", Similarity.ivfPqTopK(emb, queries, k = 10,
        coarseK = sqrtK, rerank = 40))
      recall("ivfpq_rr400", Similarity.ivfPqTopK(emb, queries, k = 10,
        coarseK = sqrtK, rerank = 400))
    }

    // ---- Serve vs train+serve: what the maintained index saves ----
    // A continuously-ingested deployment trains at swap time and serves
    // per query (IvfIndexMaintainer). This measures the per-query cost
    // split: ivfServe over pre-built lists vs ivfTopKUnlabeled paying
    // Lloyd training inline. The gap is the amortization argument.
    if (mode == "all" || mode == "serve") scales.foreach { c =>
      val emb = embAt(c).drop("label")
      val queries = embAt(1).drop("label").filter(col("vec_id") < 8)
      val sqrtK = 8 * math.sqrt(c).round.toInt
      var cents: DataFrame = null
      var lists: DataFrame = null
      time(s"ivf_train_${c}x") {
        cents = graft.Staging.pin(Similarity.trainQuantizer(emb, sqrtK))
        lists = graft.Staging.pin(Similarity.assignToCentroids(
          emb.select("vec_id", "embedding"), cents))
        lists.count()
      }
      time(s"ivf_serve_${c}x")(
        Similarity.ivfServe(lists, cents, queries, k = 10).count())
      time(s"ivf_train_and_serve_${c}x")(
        Similarity.ivfTopKUnlabeled(emb, queries, k = 10, kCentroids = sqrtK).count())
      // The deployment shape: the list table stored PARTITIONED BY list
      // id, so a serve scans only the probed lists (dynamic partition
      // pruning from the broadcast probe side), not the corpus. This —
      // not the flat scan above — is what "partitionable by list id"
      // buys at 100 TB.
      // control: same store as FLAT parquet — separates columnar-scan
      // speed from genuine list pruning
      val fdir = s"$tmp/lists_flat_${c}x"
      lists.write.mode("overwrite").parquet(fdir)
      time(s"ivf_serve_flatparquet_${c}x")(
        Similarity.ivfServe(spark.read.parquet(fdir), cents, queries, k = 10).count())
      val pdir = s"$tmp/lists_${c}x"
      time(s"ivf_store_partitioned_${c}x") {
        lists.write.mode("overwrite").partitionBy("centroid_id").parquet(pdir)
        0L
      }
      val plists = spark.read.parquet(pdir)
        .select(col("vec_id"), col("embedding"), col("centroid_id").cast("long"))
      time(s"ivf_serve_partitioned_${c}x")(
        Similarity.ivfServe(plists, cents, queries, k = 10).count())
      graft.Staging.unpin(lists); graft.Staging.unpin(cents)
    }

    // ---- SemDeDup skew guard at scale: one pathological hot cluster ----
    // 30k near-copies of one vector (mass-duplicated boilerplate) joined
    // to the 1× corpus, K=8: the hot cluster holds ~30k rows → ~450M
    // within-cluster pairs. Single-block runs that as ONE task; the
    // triangle sub-block path (blockRows=4096 → m=8, 36 block tasks)
    // spreads it across the cluster. Same survivors either way.
    if ((scales.contains(100) && mode == "all") || mode == "skew") {
      val hot = cached(s"$tmp/emb_hotcluster") {
        val base1 = embAt(1).drop("label")
        val copies = base1.filter(col("vec_id") === 0)
          .crossJoin(spark.range(1, 30001).toDF("i"))
          .select((col("i") + 50000000L).as("vec_id"),
            transform(col("embedding"), (x, j) =>
              (x.cast("double") * (lit(1.0) +
                (pmod(xxhash64(concat_ws("-", col("i"), j)), lit(100))
                  - 50).cast("double") / 5000.0)).cast("float")).as("embedding"))
        base1.unionByName(copies)
      }
      var sub: Set[Long] = null
      time("skew_semdedup_subblocked") {
        val s = Similarity.semDedup(hot, kCentroids = 8, blockRows = 4096)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        sub = s; s.size.toLong
      }
      var single: Set[Long] = null
      time("skew_semdedup_singleblock") {
        val s = Similarity.semDedup(hot, kCentroids = 8, blockRows = 1 << 30)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        single = s; s.size.toLong
      }
      println(s"SCALE100 skew_survivors_equal ${sub == single} (must be true)")
      require(sub == single, "sub-blocked and single-block survivors diverged!")
    }

    // ---- connected components beyond driverEdgeLimit, on real data ----
    // EXACT copies: every original doc becomes a 30-clique of verified
    // minhash pairs → ~5000 · C(30,2) ≈ 2.2M edges > the 1M driver bound.
    if ((scales.contains(100) && mode == "all") || mode == "cc") {
      val c = 30
      val docs = cached(s"$tmp/docs_exact_${c}x") {
        (0 until c).map { i =>
          baseDocs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars"))
        }.reduce(_ unionByName _)
      }
      var pairs: DataFrame = null
      time(s"overbound_minhash_${c}x_exact") {
        pairs = graft.Staging.pin(Dedup.minhashNearDups(docs)); pairs.count()
      }
      val nEdges = pairs.count()
      println(s"SCALE100 overbound_edges $nEdges (driverEdgeLimit=1000000)")
      require(nEdges > 1000000L, s"over-bound probe needs >1M edges, got $nEdges")
      val ids = docs.select("doc_id")
      var dist: DataFrame = null
      time(s"overbound_cc_distributed") {
        dist = graft.Staging.pin(Dedup.connectedComponents(ids, pairs)); dist.count()
      }
      var drv: DataFrame = null
      time(s"overbound_cc_driver") {
        drv = graft.Staging.pin(
          Dedup.connectedComponents(ids, pairs, driverEdgeLimit = Long.MaxValue))
        drv.count()
      }
      // label-identical on real over-bound data — the equality the spec
      // asserts at toy scale, now at 150k nodes / 2M+ edges
      val diff = dist.unionByName(drv).distinct().count() - dist.count()
      println(s"SCALE100 overbound_label_diff $diff (must be 0)")
      require(diff == 0L, "distributed and driver CC labelings diverged!")
      graft.Staging.unpin(pairs); graft.Staging.unpin(dist); graft.Staging.unpin(drv)
    }
    spark.stop()
  }
}
