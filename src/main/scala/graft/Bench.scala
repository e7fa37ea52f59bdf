package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each headline query is forced end-to-end through the `noop` sink (full
  * plan execution, every output column materialized) rather than `count()`
  * (which would let Catalyst prune the projections we mean to measure).
  */
object Bench {

  /** Headline subset: the queries whose cost is representative at scale.
    * Cheap point-lookups and tiny-output variants are exercised by Verify;
    * measuring them would just add noise.
    */
  val headline: Seq[String] = Seq(
    "etl_pipeline_scale", "etl_upsert_lww", "etl_upsert_bucketed",
    "etl_audit_tally", "etl_route_transform",
    "q1_agg", "q3_topk", "q5_join", "q_window_rank", "q_topk_agg", "q_window_running",
    "q_rollup", "q_cube", "q_semi_join", "q_anti_join", "q_distinct_agg",
    "q_approx_distinct", "q_approx_quantiles",
    "events_sessionize", "events_tumbling", "events_asof_join",
    "events_json_extract", "events_pivot", "events_range_join", "events_lead_lag",
    "events_retention", "events_histogram",
    "q_median",
    "q_set_ops", "q_ntile", "q_stats", "q_strings", "mm_resize",
    "text_tokens", "text_quality", "text_langid", "text_fingerprint",
    "text_clean_corpus", "text_decontaminate", "text_top_terms",
    "text_repetition", "text_curation_pipeline", "text_length_filter",
    "text_retrieval_bm25",
    "sample_hash", "sample_stratified", "sample_mixture", "pack_sequences",
    "sample_epoch_shuffle", "text_quality_classifier",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_cluster", "dedup_substring",
    "sim_topk_bruteforce", "sim_lsh_ann", "sim_embed_neardup",
    "sim_embed_neardup_lsh", "sim_embed_clusters", "sim_embed_decontaminate",
    "sim_ivf_ann", "sim_ivf_ann_unlabeled", "sim_semdedup", "sim_sq8_ann",
    "sim_pq_ann", "sim_pq_refine_ann", "sim_ivfpq_ann", "sim_ivfpq_refine_ann",
    "sample_cluster_balanced", "q_grouping_sets", "events_gap_fill", "q_pagerank",
    "sim_hard_negatives", "text_chunk",
    "mm_decode", "mm_frames", "mm_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = Config.benchSfDir() // fail fast on a missing/typo'd dir
    val cpus = Config.cpus()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: run every headline query once at the smallest SF
    // untimed, so timed numbers measure steady-state plans rather than
    // first-hit JIT + codegen compilation (worth 3-7s on kernel-heavy
    // queries, measured via tools/Timeit rep1-vs-rep2 deltas). Then let
    // the async ContextCleaner drain so broadcast-cleanup GC doesn't
    // land inside a timed region.
    val warmupDir = "/root/testdata/sf0.001"
    headline.filter(SparkEntry.queries.contains).foreach { n =>
      try SparkEntry.queries(n)(spark, warmupDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    System.gc()
    Thread.sleep(2000)

    // Min of two reps per query: a single sample at local[32] absorbs
    // whatever async cleanup happens to overlap it (observed 3-10x
    // outliers on single-sample runs); the min is the steady-state cost.
    val names = headline.filter(SparkEntry.queries.contains)
    // per-query GC attribution: cumulative collection millis across all
    // collectors, sampled around the BEST rep — so a stalled sample can
    // be read as "GC" vs "something else" straight from the driver
    // artifact (round-6 observed 2-5 s stalls that survive min-of-3 and
    // move between runs; this pins down their nature without a rerun)
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // JIT wall isn't 1:1 with query wall (compiler threads run
    // concurrently), but a stalled sample with multi-second jit delta
    // and zero gc reads as recompilation pressure, not a plan change
    def jitMillis(): Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    // a failed query must not masquerade as a fast one in the artifact:
    // record it in a `failed` list the driver JSON carries alongside the
    // (fast-fail) wall time, so a regression can't read as a speedup
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def once(name: String): (Double, Double, Double) = {
      val fn = SparkEntry.queries(name)
      val g0 = gcMillis(); val j0 = jitMillis()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      ((System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3,
        (jitMillis() - j0) / 1e3)
    }
    val results = names.zipWithIndex.map { case (name, _) =>
      // settle before every query: finished queries leave broadcast and
      // checkpoint blocks whose deferred cleanup otherwise lands as
      // eviction/GC storms inside later timed reps (iterative many-job
      // queries like dedup_cluster are the most exposed). The settle is
      // untimed — it trades wall-clock for stable steady-state samples.
      System.gc(); Thread.sleep(250)
      // ...and wait for JIT quiescence: on a saturated local[32] the C2
      // compiler threads compete with the query for cores, and async
      // recompilation kicked off by query N lands inside query N+1's
      // timed reps (jit_sec showed 2-3 s of concurrent compilation in
      // stalled-but-gc-0 samples). Bounded wait: quiet 200 ms window or
      // 3 s cap.
      var lastJit = jitMillis(); var waited = 0
      while (waited < 3000) {
        Thread.sleep(200)
        val now = jitMillis()
        if (now - lastJit < 20) waited = 3000
        else { lastJit = now; waited += 200 }
      }
      val s1 = once(name)
      val s2 = once(name)
      val best = math.min(s1._1, s2._1)
      // samples disagreeing by >2x means one absorbed async cleanup/GC —
      // a third rep resolves which was real; likewise when even the best
      // sample is slow in absolute terms (heavy compositions show rare
      // ~7s environmental stalls that can hit both reps)
      val samples = if (math.max(s1._1, s2._1) > 2 * best || best > 2.5)
        Seq(s1, s2, once(name)) else Seq(s1, s2)
      name -> samples.minBy(_._1)
    }
    // The driver records only a bounded tail of stdout, so the artifact of
    // record (total + per-query wall map) must be the LAST thing printed and
    // compact enough to fit the window whole: 1 ms rounding keeps the
    // 74-query map at ~1.8 KB with headroom for the window's other tenants
    // (sbt's [info] prefix and trailing [success] line) and future queries.
    // Diagnostics (gc/jit maps) go on their own preceding line that
    // deliberately does NOT start with `{"metric"` so the driver's line
    // regex can't latch onto it.
    def f4(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, (v, _, _)) => "\"" + k + "\":" + f4(v) }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, (_, g, _)) => "\"" + k + "\":" + f4(g) }
      .mkString("{", ",", "}")
    val jits = results.map { case (k, (_, _, j)) => "\"" + k + "\":" + f4(j) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"diag":"bench","gc_sec":$gcs,"jit_sec":$jits}""")
    println(s"""{"metric":"total","value":${f4(total)},"unit":"sec","queries":$qs,"failed":$failedArr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
