package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape guards: the properties SURVEY.md §8.5 claims must hold in
  * the executed physical plan, so a refactor can't silently regress the
  * scale story.
  */
class PlanRegressionSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def executed(df: DataFrame) = {
    df.write.format("noop").mode("overwrite").save() // finalize adaptive plan
    df.queryExecution.executedPlan
  }

  test("q1: shipdate filter is pushed into the parquet scan; schema pruned") {
    val plan = executed(SparkEntry.queries("q1_agg")(spark, Sf0001))
    val scan = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"))
    assert(scan.requiredSchema.size < 11, "scan must not read all lineitem columns")
  }

  test("q5: star join runs as broadcast joins (fact side never shuffles for joins)") {
    val plan = executed(SparkEntry.queries("q5_join")(spark, Sf0001))
    val bcasts = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 4, s"expected >=4 broadcast joins, got ${bcasts.size}")
  }

  test("q_topk_agg: bounded-heap aggregate, no window sort operator") {
    val plan = executed(SparkEntry.queries("q_topk_agg")(spark, Sf0001))
    assert(collectWithSubqueries(plan) { case o: ObjectHashAggregateExec => o }.nonEmpty)
    assert(collectWithSubqueries(plan) { case w: WindowExec => w }.isEmpty)
  }

  test("q_window_rank: Spark's WindowGroupLimit prunes map-side") {
    val plan = executed(SparkEntry.queries("q_window_rank")(spark, Sf0001))
    val limits = collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty, "rank<=k should trigger WindowGroupLimit")
  }

  test("dedup_ngram_jaccard: sketch tables broadcast to the candidate stream") {
    val plan = executed(SparkEntry.queries("dedup_ngram_jaccard")(spark, Sf0001))
    val bcasts = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 2, "pair verification must join against broadcast sketches")
    // both pair sides probe ONE broadcast relation: the second side must
    // reuse the first side's exchange, not rebuild the hashed sketches.
    // Exchange reuse only materializes in the FINAL adaptive plan, so
    // drive this query's own QueryExecution to completion (tiny result)
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, Sf0001)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan
    val reused = collectWithSubqueries(finalPlan) {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty, "verify must reuse a single broadcast for both pair sides")
  }

  test("dedup_ngram_allpairs: prefix self-join stays shuffled-hash on skinny keys; verify broadcasts") {
    val plan = executed(SparkEntry.queries("dedup_ngram_allpairs")(spark, Sf0001))
    // verify stage: both hashed-sketch sides join broadcast
    val bcasts = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 2, "pair verification must join against broadcast sketches")
    // no cartesian product anywhere — the candidate stage must be an
    // equi-join on prefix elements, never a blind enumeration
    val cart = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cart.isEmpty, "exhaustive operator must not plan a cartesian/nested-loop join")
  }

  test("text_decontaminate: benchmark n-gram index broadcasts; no sort-merge join") {
    val plan = executed(SparkEntry.queries("text_decontaminate")(spark, Sf0001))
    assert(collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "corpus probe must join the broadcast benchmark index")
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, "decontamination must not shuffle-sort the corpus")
  }

  test("sample_mixture: rate table broadcasts back; the corpus never sort-merges") {
    val plan = executed(SparkEntry.queries("sample_mixture")(spark, Sf0001))
    assert(collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "per-group rates must broadcast to the filter")
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty)
  }

  test("pack_sequences: exactly one shuffle (the per-shard packing window)") {
    val plan = executed(SparkEntry.queries("pack_sequences")(spark, Sf0001))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, s"expected 1 shuffle, got ${exchanges.size}")
  }

  test("text_repetition: map-side only — no shuffle at all") {
    val plan = executed(SparkEntry.queries("text_repetition")(spark, Sf0001))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "repetition signals are a pure projection")
  }

  test("dedup_substring: frequent-chain index broadcasts; corpus never sort-merges") {
    val plan = executed(SparkEntry.queries("dedup_substring")(spark, Sf0001))
    assert(collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "position hits must probe the broadcast frequent-gram index")
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, "passage dedup must not shuffle-sort the corpus")
  }

  test("sim_ivf_ann_unlabeled: seed selection is a bounded top-K, never a global sort") {
    // the seed stage runs as its own checkpointed job before training, so
    // it must be asserted on its own plan, not the final query's lineage
    val seeds = graft.sim.Similarity.ivfSeeds(
      Tables.embeddings(spark, Sf0001).drop("label"), 8)
    val seedPlan = executed(seeds)
    val takeOrdered = collectWithSubqueries(seedPlan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takeOrdered.nonEmpty,
      "md5-ranked seeding must plan as TakeOrderedAndProject (bounded heap)")
    val globalSorts = collectWithSubqueries(seedPlan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, "seeding must never globally sort the corpus")
    // and the final probe/re-rank plan is sort-free too
    val plan = executed(SparkEntry.queries("sim_ivf_ann_unlabeled")(spark, Sf0001))
    val finalGlobalSorts = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(finalGlobalSorts.isEmpty, "no stage of IVF may globally sort the corpus")
  }

  test("text_chunk: pure row-local fan-out — no shuffle at all") {
    val plan = executed(SparkEntry.queries("text_chunk")(spark, Sf0001))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "chunking is generate + substring, row-local")
  }

  test("sim_sq8_ann: quantization grid broadcasts; corpus never sort-merges") {
    val plan = executed(SparkEntry.queries("sim_sq8_ann")(spark, Sf0001))
    val bcastNL = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bcastNL.nonEmpty, "qparams + query set must reach the corpus as broadcasts")
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, "SQ8 scoring must not shuffle-sort the corpus")
  }

  test("sim_pq_ann: codebooks and ADC tables broadcast; the corpus never shuffles") {
    // training is pinned (localCheckpoint), so the final plan is encode
    // + score: both must reach the corpus scan as broadcasts
    val plan = executed(SparkEntry.queries("sim_pq_ann")(spark, Sf0001))
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only permissible shuffle is the final top-k window partition
    assert(exchanges.size <= 1, s"PQ encode/score must not shuffle the corpus: $exchanges")
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, "PQ scoring must be broadcast, never sort-merge")
  }

  test("text_retrieval_bm25: stats row broadcasts; document rows never shuffle") {
    val plan = executed(SparkEntry.queries("text_retrieval_bm25")(spark, Sf0001))
    // the only join is the 1-row corpus-stats crossJoin, as a broadcast
    val nl = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(nl.nonEmpty, "corpus stats must reach the scorer as a broadcast")
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the stats aggregate is the only permissible exchange (1 row to the
    // driver-side agg); document rows themselves must never shuffle
    assert(exchanges.size <= 1, s"document rows must not shuffle: $exchanges")
    val smj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, "retrieval scoring must never sort-merge the corpus")
  }

  test("text_ppl / text_dsir: pruned scans, no cartesian, no global sort") {
    Seq("text_ppl", "text_dsir").foreach { q =>
      val plan = executed(SparkEntry.queries(q)(spark, Sf0001))
      // the documents scan must read only (doc_id, lang, text) — n_chars
      // and source are dead columns for the LM scorers
      val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      scans.foreach(s => assert(s.requiredSchema.size <= 3,
        s"$q scan reads ${s.requiredSchema.fieldNames.mkString(",")}"))
      // model scoring is joins + partial-agged groupBys: anything
      // quadratic or globally sorted is a regression
      val cart = collectWithSubqueries(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cart.isEmpty, s"$q must not build a cartesian product")
      val globalSorts = collectWithSubqueries(plan) {
        case st: org.apache.spark.sql.execution.SortExec if st.global => st
      }
      assert(globalSorts.isEmpty, s"$q must not sort globally")
    }
  }

  test("q_window_range: RANGE-frame window, no global sort beyond the window's own") {
    val plan = executed(SparkEntry.queries("q_window_range")(spark, Sf0001))
    val wins = collectWithSubqueries(plan) { case w: WindowExec => w }
    assert(wins.nonEmpty, "range query must plan a Window operator")
    // exactly one exchange: the o_custkey partitioning the window needs
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"range window needs one shuffle, got ${exchanges.size}")
  }

  test("events_interval_join / dedup_editdist: no cartesian product anywhere") {
    Seq("events_interval_join", "dedup_editdist").foreach { q =>
      val plan = executed(SparkEntry.queries(q)(spark, Sf0001))
      val cart = collectWithSubqueries(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      assert(cart.isEmpty, s"$q must never plan a cartesian product")
      val bnl = collectWithSubqueries(plan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(bnl.isEmpty, s"$q must never plan a nested-loop join " +
        "(the grid/banding exists to make these equi-joins)")
    }
  }

  test("mm_neardup: signatures shuffle on (band,bucket); payloads pruned from the scan") {
    val plan = executed(SparkEntry.queries("mm_neardup")(spark, Sf0001))
    // banding join may hash-shuffle 16-byte signatures, never sort-merge
    // the payload side
    val smj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, "perceptual banding must stay a hash join")
    val globalSorts = collectWithSubqueries(plan) {
      case st: org.apache.spark.sql.execution.SortExec if st.global => st
    }
    assert(globalSorts.isEmpty, "no global sort anywhere in the near-dup plan")
  }

  test("sim_semdedup: one corpus shuffle (by cluster) in the pair stage") {
    // training is pinned via localCheckpoint, so the final plan shows
    // only the post-training stages: the repartition by centroid_id,
    // the within-cluster pair join and the survivor anti-join
    val plan = executed(SparkEntry.queries("sim_semdedup")(spark, Sf0001))
    // the only merge join allowed is the survivors LeftAnti (dominated
    // ids can be a large corpus fraction — not broadcastable at scale,
    // so a shuffled join with per-partition sort is the honest plan);
    // the within-cluster PAIR join must stay a hash join on the cluster
    // partitioning
    val smj = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.forall(_.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"only the survivors anti-join may merge-join, got ${smj.map(_.joinType)}")
    val globalSorts = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, "semantic dedup must never globally sort the corpus")
    // the corpus argmax scan must run ONCE: pair sides and the survivors
    // anti-join all derive from one canonical projection, so AQE's
    // exchange reuse collapses them (a branch-specific pruned projection
    // regressed this to three scans once)
    val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
    assert(scans.size <= 1, s"expected the corpus scan once, got ${scans.size}")
  }

  test("ivfServe over a list-partitioned store: dynamic partition pruning scans only probed lists") {
    import org.apache.spark.sql.functions._
    import graft.sim.Similarity
    val emb = Tables.embeddings(spark, Sf0001).drop("label")
    val queries = emb.filter(col("vec_id") < 8)
    val cents = Similarity.trainQuantizer(emb, 8)
    val lists = Similarity.assignToCentroids(emb.select("vec_id", "embedding"), cents)
    val pdir = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/lists"
    lists.write.partitionBy("centroid_id").parquet(pdir)
    val plists = spark.read.parquet(pdir)
      .select(col("vec_id"), col("embedding"), col("centroid_id").cast("long"))
    val served = Similarity.ivfServe(plists, cents, queries, k = 5)
    val plan = executed(served)
    // the store scan must carry a dynamic-pruning partition filter fed
    // from the probe side — the plan property that makes a 100 TB serve
    // scan nprobe lists, not the corpus
    val scan = collectWithSubqueries(plan) {
      case s: FileSourceScanExec
        if s.requiredSchema.fieldNames.contains("embedding") => s
    }.head
    assert(scan.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning on the list store scan: ${scan.partitionFilters}")
    // and the answer is the same as serving the unpartitioned assignment
    val want = Similarity.ivfServe(lists, cents, queries, k = 5).collect().toSet
    assert(served.collect().toSet == want)
  }

  test("mm_video_real: payloads never shuffle - the frame decode plan has zero exchanges") {
    val plan = executed(SparkEntry.queries("mm_video_real")(spark, Sf0001))
    val ex = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(ex.isEmpty,
      s"per-frame decode must run where the scan put the payloads, got ${ex.size} exchange(s)")
  }

  test("classifierScoreWith: frozen weights broadcast - scoring never sort-merges the corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val w = graft.text.TextAnalysis.trainClassifierWeights(docs, d = 16, rounds = 1)
    val plan = executed(graft.text.TextAnalysis.classifierScoreWith(docs, w, d = 16))
    val bcasts = collectWithSubqueries(plan) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.nonEmpty, "the weight table must join broadcast")
    // the doc_id left-join restoring zero-token docs may legitimately
    // sort-merge (both sides doc-scale); the WEIGHT join must not
    val smjOnBucket = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("b#")) => j
    }
    assert(smjOnBucket.isEmpty, "the weight-table join must not sort-merge")
    graft.Staging.unpin(w)
  }

  test("langIdWith: the |L|-row marginals ride a broadcast; no cartesian product sneaks in") {
    val docs = Tables.documents(spark, Sf0001)
    val model = graft.text.TextAnalysis.trainLangModel(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0))
    val plan = executed(graft.text.TextAnalysis.langIdWith(docs, model))
    // the token × candidate-language blowup must be the broadcast
    // nested-loop over the tiny marginals frame, never a shuffled
    // cartesian (CartesianProductExec materializes both sides)
    val cartesian = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesian.isEmpty, "the candidate fan-out must broadcast")
    val bnl = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "the marginals frame must ride a broadcast")
  }

  test("bpe argmax plans as a bounded TakeOrdered, never a global sort") {
    // the per-round argmax inside the trainer is orderBy().limit(1) -
    // assert the plan property on the same construction over the real
    // pair-count aggregate shape
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val docs = Tables.documents(spark, Sf0001)
    val pairs = docs
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1)
    val plan = executed(pairs)
    val take = collectWithSubqueries(plan) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(take.nonEmpty, "argmax must plan as TakeOrderedAndProject")
    val sorts = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.isEmpty, "argmax must not plan a global sort")
  }

  test("deleteWhere's matched-set plan prunes the scan to key ++ order ++ predicate columns") {
    // the r19 predicate verbs claim "Catalyst prunes columns to keys ++
    // order ++ predicate refs through the resolve's window" — pin it on
    // the exact plan deleteWhere stages (resolve → filter → key/order
    // projection) over a table whose rows carry a WIDE value payload
    // the delete never references
    import org.apache.spark.sql.functions.{col, lit}
    import graft.sink.KeyedUpsertSink
    val root = java.nio.file.Files.createTempDirectory("graft-delw-plan")
    val t = root.resolve("t").toString
    import spark.implicits._
    val keys = Seq("k"); val order = Seq(col("ts"))
    val wide = (1L to 64L).map(i =>
      (s"k$i", i, i % 7, "x" * 32, "y" * 32, "z" * 32))
      .toDF("k", "ts", "q", "pad_a", "pad_b", "pad_c")
    KeyedUpsertSink.upsertBucketedDelta(
      spark, t, keys, order, numBuckets = 4, compactAfter = 0)(wide, 0L)
    KeyedUpsertSink.upsertBucketedDelta(
      spark, t, keys, order, numBuckets = 4, compactAfter = 0)(
      wide.withColumn("ts", col("ts") + lit(100L)), 1L) // chains → resolve window is live
    val matched = KeyedUpsertSink
      .readBucketedDelta(spark, t, keys, order)
      .filter(col("q") === 3L)
      .select("k", "ts")
    val plan = executed(matched)
    val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.exists(_.startsWith("pad_")),
        s"the matched-set scan must not read unreferenced value " +
          s"columns, got ${read.toSeq.sorted}")
    }
  }
}
