package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Sampling
import graft.text.TextAnalysis

/** Corpus-curation operators: near-dup clustering, benchmark
  * decontamination, deterministic sampling, characteristic terms.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: transitive pairs collapse to one cluster, singletons stay") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // 1~2, 2~3 (one chain), 5~6; 4 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponents(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val n = 12L
    val docs = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponents(docs, pairs).as[(Long, Long)].collect().toMap
    assert(got == (1L to n).map(_ -> 1L).toMap)
  }

  test("connectedComponents: empty pair set leaves every document a singleton") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    val got = Dedup.connectedComponents(docs, noPairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("connectedComponents: driver fast path and distributed loop label identically") {
    val emb = Tables.embeddings(spark, Sf0001)
    val docs = emb.select(col("vec_id").as("doc_id"))
    val pairs = graft.sim.Similarity.embeddingNearDupsLsh(emb)
      .select(col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b"))
    val fast = Dedup.connectedComponents(docs, pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(docs, pairs, driverEdgeLimit = -1L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist)
    assert(fast.size == docs.count())
  }

  test("jaccardClusters assigns every document exactly one cluster id") {
    val docs = Tables.documents(spark, Sf0001)
    val labels = Dedup.jaccardClusters(docs)
    assert(labels.count() == docs.count())
    // cluster ids are component minima: every cluster id is itself a doc
    // whose own label is itself
    val roots = labels.select(col("cluster_id").as("doc_id")).distinct()
    val bad = roots.join(labels, "doc_id")
      .filter(col("cluster_id") =!= col("doc_id")).count()
    assert(bad == 0)
    // pairs and labels agree: both ends of every verified pair share a cluster
    val pairs = Dedup.blockedJaccardPairs(docs)
    val la = labels.select(col("doc_id").as("doc_id_a"), col("cluster_id").as("ca"))
    val lb = labels.select(col("doc_id").as("doc_id_b"), col("cluster_id").as("cb"))
    assert(pairs.join(la, "doc_id_a").join(lb, "doc_id_b")
      .filter(col("ca") =!= col("cb")).count() == 0)
  }

  test("decontaminate flags only docs sharing >= minShared bigrams with the benchmark") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),        // benchmark (id % 2 == 0 here)
      (1L, "the quick brown fox sleeps"),        // 3 shared bigrams -> flagged
      (3L, "a quick brown cat"),                 // 1 shared bigram  -> dropped
      (5L, "nothing in common at all"))          // 0 shared         -> dropped
      .toDF("doc_id", "text")
    val got = Dedup.decontaminate(docs, col("doc_id") % 2 === 0, minShared = 3)
      .as[(Long, Long, Long)].collect().toSeq
    // "the quick", "quick brown", "brown fox" shared with benchmark doc 0
    assert(got == Seq((1L, 3L, 1L)))
  }

  test("hash sampling is deterministic and respects the rate") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang")
    val a = Sampling.hashBernoulli(docs, col("doc_id"), 4)
    val b = Sampling.hashBernoulli(docs, col("doc_id"), 4)
    assert(a.collect().toSet == b.collect().toSet) // rerun-stable
    val n = docs.count().toDouble
    val k = a.count().toDouble
    assert(k / n > 0.15 && k / n < 0.35, s"got rate ${k / n}, want ~0.25")
    // rate 16/16 keeps everything; 0/16 keeps nothing
    assert(Sampling.hashBernoulli(docs, col("doc_id"), 16).count() == n.toLong)
    assert(Sampling.hashBernoulli(docs, col("doc_id"), 0).count() == 0)
  }

  test("stratified sampling returns exactly N per stratum (or the whole stratum)") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang")
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = Sampling.stratifiedTopN(docs, col("lang"), col("doc_id"), 10)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == sizes.map { case (l, c) => l -> math.min(c, 10L) })
  }

  test("mixtureSqrt flattens group shares at rate sqrt(n_min/n_g)") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang", "source", "n_chars")
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val nMin = counts.values.min
    val got = Sampling.mixtureSqrt(docs, col("lang"), col("doc_id"))
    // rerun-stable
    assert(got.collect().toSet == Sampling.mixtureSqrt(
      docs, col("lang"), col("doc_id")).collect().toSet)
    // kept counts track n_g * sqrt(n_min/n_g) = sqrt(n_min*n_g)
    val kept = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    counts.foreach { case (g, n) =>
      val want = math.sqrt(nMin.toDouble * n.toDouble)
      val k = kept.getOrElse(g, 0L).toDouble
      assert(math.abs(k - want) < 4 * math.sqrt(want) + 5, s"$g: kept $k want ~$want")
    }
    // the rarest group keeps everything (rate exactly 1)
    val rarest = counts.minBy(_._2)._1
    assert(kept(rarest) == counts(rarest))
  }

  test("mixtureSqrt downsamples a NULL group at its rate instead of dropping it") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang")
      .withColumn("lang",
        when(col("doc_id") % 5 === 0, lit(null: String)).otherwise(col("lang")))
    val nNull = docs.filter(col("lang").isNull).count()
    assert(nNull > 0)
    val kept = Sampling.mixtureSqrt(docs, col("lang"), col("doc_id"))
      .filter(col("lang").isNull).count()
    // null is a group like any other: present, downsampled, not removed
    assert(kept > 0 && kept <= nNull, s"null group: kept $kept of $nNull")
  }

  test("packSequences: offsets stay under budget and sequences chain within a shard") {
    val docs = Seq(
      (1L, "s1", 1000L), (2L, "s1", 1500L), (3L, "s1", 100L), (4L, "s1", 3000L),
      (10L, "s2", 2048L), (11L, "s2", 1L))
      .toDF("doc_id", "source", "n_tok")
    val got = Sampling.packSequences(docs, col("source"), col("doc_id"),
      col("n_tok"), budget = 2048L)
      .select("doc_id", "seq_idx", "seq_offset")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, o) => id -> (s, o) }.toMap
    assert(got(1L) == (0L, 0L))      // cum 0
    assert(got(2L) == (0L, 1000L))   // cum 1000
    assert(got(3L) == (1L, 452L))    // cum 2500 -> seq 1, offset 452
    assert(got(4L) == (1L, 552L))    // cum 2600
    assert(got(10L) == (0L, 0L))     // shard s2 restarts
    assert(got(11L) == (1L, 0L))     // cum 2048 -> exactly next sequence
  }

  test("epochShuffle: dense per-shard positions, epoch-independent permutations") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id")
    val e1 = Sampling.epochShuffle(docs, col("doc_id"), epoch = 1, nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(e1.length == 500)
    // every shard's positions are exactly 0..|shard|-1 (a true permutation)
    e1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 8)
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic rerun
    val again = Sampling.epochShuffle(docs, col("doc_id"), epoch = 1, nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(e1.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different epoch is a different permutation (salted hash)
    val e2 = Sampling.epochShuffle(docs, col("doc_id"), epoch = 2, nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(e1.sortBy(_._1).toSeq != e2.sortBy(_._1).toSeq)
    // and the hash order isn't doc_id order
    val shard0 = e1.filter(_._2 == 0).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
  }

  test("repetitionSignals kernel equals the explode+groupBy formulation on real docs") {
    val docs = Tables.documents(spark, Sf0001)
    val fast = TextAnalysis.repetitionSignals(docs)
      .select("doc_id", "n_tokens", "top_unigram_n", "top_bigram_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val slow = TextAnalysis.repetitionSignalsByGroupBy(docs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }

  test("repetitionSignals measures repeated phrases") {
    val docs = Seq(
      (1L, "buy now buy now buy now"),
      (2L, "all words are different here")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs)
      .select("doc_id", "n_tokens", "top_unigram_n", "top_bigram_n")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, u, b) => id -> (n, u, b) }.toMap
    // "buy" x3; bigrams: "buy now" x3, "now buy" x2
    assert(got(1L) == (6L, 3L, 3L))
    assert(got(2L) == (5L, 1L, 1L))
  }

  test("curation pipeline: gates, dedup, decontamination and packing hold together") {
    import graft.pipeline.Curation
    val docs = Tables.documents(spark, Sf0001)
    val out = Curation.curate(docs, col("doc_id") % 37 === 0, minShared = 40L)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // no benchmark docs in the corpus
    assert(out.filter(col("doc_id") % 37 === 0).count() == 0)
    // gates held
    assert(out.filter(col("n_tokens") < 10
      || col("stopword_ratio") > 0.5 || col("top_bigram_frac") > 0.1).count() == 0)
    // packing invariants
    assert(out.filter(col("seq_offset") >= 2048 || col("seq_offset") < 0).count() == 0)
    assert(out.filter(col("sample_rate") > 1.0).count() == 0)
    // rerun-stable (deterministic end to end)
    assert(Curation.curate(docs, col("doc_id") % 37 === 0, minShared = 40L)
      .collect().toSet == rows.toSet)
  }

  test("lengthOutlierFilter cuts per-group tails, not a global bound") {
    val docs = Seq(
      // group a: lengths 10..19 + one huge outlier
      (Seq.tabulate(10)(i => (i.toLong, "a", 10L + i)) :+ ((100L, "a", 10000L))) ++
      // group b: lengths 1000..1009 — all normal FOR THEIR GROUP
      Seq.tabulate(10)(i => (200L + i, "b", 1000L + i)): _*)
      .toDF("doc_id", "lang", "n_chars")
    val kept = TextAnalysis.lengthOutlierFilter(docs, col("lang"))
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(100L), "group-a outlier must be cut")
    // group b's 1000+ lengths survive even though they dwarf group a's
    assert((200L to 209L).count(kept.contains) >= 8)
    // deterministic
    assert(TextAnalysis.lengthOutlierFilter(docs, col("lang"))
      .select("doc_id").as[Long].collect().toSet == kept)
  }

  test("empty and whitespace-only documents flow through every text gate (ANSI /0 guard)") {
    val docs = Seq(
      (1L, "", "s", 0L), (2L, "   ", "s", 3L),
      (3L, "the quick brown fox jumps over a lazy dog it is fine", "s", 52L))
      .toDF("doc_id", "text", "source", "n_chars").withColumn("lang", lit("en"))
    // none of these may throw SparkArithmeticException on the empty docs
    assert(TextAnalysis.qualitySignals(docs).count() == 3)
    assert(TextAnalysis.qualitySignalsHof(docs).count() == 3)
    assert(TextAnalysis.cleanCorpus(docs).count() == 1)     // only doc 3 passes
    assert(graft.pipeline.Curation.gates(docs, col("doc_id") < 0).count() == 1)
    // NULL ratios for the degenerate docs, real values for the healthy one
    val q = TextAnalysis.qualitySignals(docs).orderBy("doc_id").collect()
    assert(q(0).isNullAt(q(0).fieldIndex("stopword_ratio")))
    assert(!q(2).isNullAt(q(2).fieldIndex("stopword_ratio")))
  }

  test("topTerms ranks rarer terms first at equal tf") {
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple date"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(docs, k = 2)
      .select("doc_id", "rnk", "term")
      .as[(Long, Long, String)].collect().toSet
    // banana: tf=2 and df=1 dominates; apple appears everywhere (df=3)
    assert(got.contains((1L, 1L, "banana")))
    assert(got.contains((1L, 2L, "apple")))
    // doc 2: cherry (df=1) beats apple (df=3) at tf=1 each
    assert(got.contains((2L, 1L, "cherry")))
  }

  test("countMinFrequencies never underestimates; absent terms read their cell floor") {
    val docs = Tables.documents(spark, Sf0001)
    val probes = TextAnalysis.stopwords ++ Seq("zyzzyva")
    val got = TextAnalysis.countMinFrequencies(docs, probes)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSet == probes.toSet)
    // the CMS guarantee: est >= exact for every probe
    got.foreach { case (t, est, exact) => assert(est >= exact, s"term $t") }
    // total-mass bound sanity: overestimate < N (trivially) and the
    // stopword probes are genuinely present in the corpus
    val n = docs.select(explode(TextAnalysis.tokens(col("text")))).count()
    got.foreach { case (t, est, exact) => assert(est - exact < n, s"term $t") }
    // the sf0.001 corpus genuinely contains at least some stopword mass
    // (not every stopword need appear in ~50 synthetic docs)
    assert(got.exists(r => TextAnalysis.stopwords.contains(r._1) && r._3 > 0))
  }

  test("countMin is exact when the sketch is collision-free") {
    // 3 distinct terms into a 4×4096 sketch: md5 cells collide for none
    // of them (deterministic — verified by this test), so est == exact
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma alpha")).toDF("doc_id", "text")
    val got = TextAnalysis.countMinFrequencies(
        docs, Seq("alpha", "beta", "gamma", "delta"), d = 4, w = 4096)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("alpha") == ((2L, 2L)))
    assert(got("beta") == ((2L, 2L)))
    assert(got("gamma") == ((1L, 1L)))
    assert(got("delta") == ((0L, 0L)))
  }

  test("decontaminateBloom equals the exact operator; the bitset prunes map-side") {
    val docs = Tables.documents(spark, Sf0001)
    val bench = docs.filter(col("doc_id") % 37 === 0)
    val corpus = docs.filter(col("doc_id") % 37 =!= 0)
    val exact = Dedup.decontaminateCorpus(corpus, bench)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Dedup.decontaminateBloom(corpus, bench)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom == exact)
    // the prefilter never drops a true hit (candidates ⊇ matching grams) …
    val benchIndex = bench.select(explode(Dedup.shingles(col("text"), 2)).as("ng"),
      col("doc_id").as("bench_doc_id")).distinct()
    val corpusGrams = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ng"))
    val trueHits = corpusGrams.join(benchIndex.select("ng").distinct(), "ng")
      .select("doc_id", "ng").distinct()
    val candidates = Dedup.bloomCandidates(corpus, benchIndex, 1 << 18, 3)
    assert(trueHits.exceptAll(candidates).count() == 0)
    // … and it genuinely prunes: the candidate stream is a strict subset
    // of the raw gram stream (false-positive rate bounded, not saturated)
    val nAll = corpusGrams.count()
    val nCand = candidates.count()
    assert(nCand < nAll)
  }

  test("redactPii tags every category and counts on the raw text") {
    val rows = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or call 415-555-0199"),
      (2L, "server 192.168.001.42 logged card 4111111111111111 twice: 4111111111111111"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val got = rows.select(
        Seq(col("doc_id"), TextAnalysis.redactPii(col("text")).as("clean"))
          ++ TextAnalysis.piiCounts(col("text")): _*)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "mail me at <EMAIL> or call <PHONE>")
    assert(got(1L)._3 == 1 && got(1L)._4 == 1 && got(1L)._5 == 0 && got(1L)._6 == 0)
    assert(got(2L)._2 == "server <IP> logged card <ID> twice: <ID>")
    assert(got(2L)._5 == 1 && got(2L)._6 == 2)
    // no-PII text passes through byte-identical with all-zero counts
    assert(got(3L)._2 == "no pii here at all")
    assert(got(3L)._3 + got(3L)._4 + got(3L)._5 + got(3L)._6 == 0)
  }

  test("redacted corpus wire text retains no digit runs outside tags") {
    // the synthesized text_pii_redact wire column, via the driver surface
    val out = SparkEntry.queries("text_pii_redact")(spark, Sf0001)
    assert(out.count() > 0)
    // every residual digit sits inside an <IP>-free remnant of ≤8 digits:
    // emails/phones/ips/ids are all gone, so no run of 9+ digits and no
    // x.x.x.x quad survives anywhere
    val leaky = out.filter(col("clean_text").rlike("[0-9]{9,}")
      || col("clean_text").rlike("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")
      || col("clean_text").rlike("@")
      || col("clean_text").rlike("[0-9]{3}-[0-9]{3}-[0-9]{4}")).count()
    assert(leaky == 0)
    // counts match the wire construction policy
    val bad = out.filter(col("n_emails") =!= 1
      || col("n_ips") =!= 1
      || (col("n_phones") =!= when(col("doc_id") % 5 === 0, 0L).otherwise(1L))
      || (col("n_ids") =!= when(col("doc_id") % 3 === 0, 1L).otherwise(0L))).count()
    assert(bad == 0)
  }

  test("datasetSplit: growth-stable assignments, fractions near target, salt changes the draw") {
    import graft.sample.Sampling
    val ids = spark.range(0, 10000).toDF("doc_id")
    val full = Sampling.datasetSplit(ids, col("doc_id"))
      .as[(Long, String)].collect().toMap
    // growth stability: the split of the first 1000 ids is identical when
    // the other 9000 don't exist (random split has no such property)
    val small = Sampling.datasetSplit(ids.filter(col("doc_id") < 1000), col("doc_id"))
      .as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => full(id) == s })
    // fractions concentrate near 5/5/90 (md5 uniformity, n=10000)
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("test") - 500) < 150, s"test=${counts("test")}")
    assert(math.abs(counts("val") - 500) < 150, s"val=${counts("val")}")
    // a different salt draws a different split
    val other = Sampling.datasetSplit(ids, col("doc_id"), salt = "split2")
      .as[(Long, String)].collect().toMap
    assert(other.exists { case (id, s) => full(id) != s })
  }
}
