package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no
  * UDFs): at 100 TB each is a single scan with map-side-only work — no
  * shuffle at all unless the caller aggregates. Document order never
  * matters; every function is row-local.
  */
object TextAnalysis {

  /** Whitespace tokenization for the corpus's `[a-z ]` text; the regex
    * guards against runs of spaces. Returns an array column.
    */
  def tokens(text: Column): Column =
    filter(split(text, " +"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: a crude proxy for tokenizer cost — counts
    * maximal runs of ≤4 characters (common BPE piece length), i.e.
    * ceil(len(word)/4) summed over words. Deterministic and
    * SQL-expressible, so the oracle can check it exactly.
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** Quality-scoring signals (length, lexical diversity, stopword ratio,
    * mean token length). Ratios are small-magnitude doubles — safe to
    * normalize to decimal(18,6) for oracle comparison.
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Fast path: all token statistics from one single-pass kernel
    * (VecText.TextStats); identical outputs to qualitySignalsHof
    * (asserted by TextStatsParitySpec).
    */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val stats = graft.functions.VecText.text_stats(tokens(col("text"))).as("st")
    val nTok = element_at(col("st"), 1)
    // zero-token/zero-length docs get NULL ratios: Spark's ANSI double
    // division THROWS on /0 (one empty doc would kill a corpus job)
    // while DuckDB yields NULL — the guard makes both engines emit NULL
    def overTokens(num: Column): Column = when(nTok > 0, num / nTok.cast("double"))
    docs.select(col("doc_id"), col("text"), stats)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        nTok.as("n_tokens"),
        // ratios round through decimal(18,6) (cross-engine-stable), then
        // out as double so pyarrow/DuckDB hash the same representation
        overTokens(element_at(col("st"), 2).cast("double"))
          .cast("decimal(18,6)").cast("double").as("stopword_ratio"),
        overTokens(element_at(col("st"), 3).cast("double"))
          .cast("decimal(18,6)").cast("double").as("distinct_ratio"),
        overTokens(length(expr("replace(text, ' ', '')")).cast("double"))
          .cast("decimal(18,6)").cast("double").as("mean_token_len"),
        when(length(col("text")) > 0,
          length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
            length(col("text")).cast("double"))
          .cast("decimal(18,6)").cast("double").as("punct_ratio"))
  }

  /** HOF reference formulation — kept as the parity-test anchor. */
  def qualitySignalsHof(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    def overTokens(num: Column): Column = when(nTok > 0, num / nTok)
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_actual"),
      size(toks).cast("long").as("n_tokens"),
      overTokens(nStop).cast("decimal(18,6)").cast("double").as("stopword_ratio"),
      overTokens(nUniq).cast("decimal(18,6)").cast("double").as("distinct_ratio"),
      overTokens(length(expr("replace(text, ' ', '')")).cast("double"))
        .cast("decimal(18,6)").cast("double").as("mean_token_len"),
      when(length(col("text")) > 0,
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
          length(col("text")).cast("double"))
        .cast("decimal(18,6)").cast("double").as("punct_ratio"))
  }

  /** Repetition signals (the Gopher-family repetition filters): the mass
    * of the single most-repeated unigram and bigram per document. High
    * values flag boilerplate/spam ("buy now buy now buy now") that
    * length/stopword signals miss. One single-pass kernel per row
    * (VecText.RepetitionStats) — map-side only, no shuffle; the
    * explode+groupBy formulation would shuffle every token in the corpus.
    * Bigrams are counted with multiplicity (a distinct-shingle set cannot
    * measure repetition).
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val st = graft.functions.VecText.repetition_stats(tokens(col("text"))).as("st")
    val nTok = element_at(col("st"), 1)
    val maxUni = element_at(col("st"), 2)
    val nBi = element_at(col("st"), 3)
    val maxBi = element_at(col("st"), 4)
    docs.select(col("doc_id"), st)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        maxUni.as("top_unigram_n"),
        maxBi.as("top_bigram_n"),
        when(nTok > 0, (maxUni.cast("double") / nTok.cast("double"))
          .cast("decimal(18,6)").cast("double")).as("top_unigram_frac"),
        when(nBi > 0, (maxBi.cast("double") / nBi.cast("double"))
          .cast("decimal(18,6)").cast("double")).as("top_bigram_frac"))
  }

  /** Explode+groupBy reference formulation — parity-test anchor only
    * (shuffles every token; do not use at scale).
    */
  def repetitionSignalsByGroupBy(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_tokens"), max("c").as("top_unigram_n"))
    val bi = toks
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .otherwise(array())).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram_n"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("top_unigram_n"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  /** Fasttext-style quality classifier: score = w·φ(doc)/n_tokens where
    * φ is hashed unigram features and w is a deterministic md5-derived
    * stand-in weight table (weight(t) ∈ [−1, 1] in steps of 1/1000 —
    * see VecTextKernels.hashWeightSum). A real pipeline drops in trained
    * weights (broadcast table or compiled-in array); the execution shape
    * is identical: ONE map-side pass per document, no shuffle, and
    * because per-token weights sum as exact longs the score — and the
    * keep/cut decision — is bit-reproducible across engines, runs, and
    * partitionings.
    *
    * `keep` is derived from the decimal(18,6)-ROUNDED score so the
    * boundary decision is cross-engine stable (a raw-double threshold
    * compare would hinge on bits the oracle never sees). Zero-token
    * docs: NULL score, keep=false.
    */
  def classifierScore(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"),
        graft.functions.VecText.hash_weight_sum(toks).as("w_sum"),
        size(toks).cast("long").as("n_tokens"))
      .withColumn("score",
        when(col("n_tokens") > 0,
          col("w_sum").cast("double") / (col("n_tokens").cast("double") * 1000.0))
          .cast("decimal(18,6)").cast("double"))
      .withColumn("keep", coalesce(col("score") > lit(threshold), lit(false)))
  }

  /** HOF reference formulation — parity-test anchor for classifierScore
    * (interpreted per-token lambda; do not use at scale).
    */
  def classifierScoreHof(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val toks = tokens(col("text"))
    val wSum = aggregate(toks, lit(0L), (acc, t) =>
      acc + (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 2001L - 1000L))
    docs.select(col("doc_id"), wSum.as("w_sum"), size(toks).cast("long").as("n_tokens"))
      .withColumn("score",
        when(col("n_tokens") > 0,
          col("w_sum").cast("double") / (col("n_tokens").cast("double") * 1000.0))
          .cast("decimal(18,6)").cast("double"))
      .withColumn("keep", coalesce(col("score") > lit(threshold), lit(false)))
  }

  /** A TRAINED hashed-feature quality classifier (round 18): the
    * [[classifierScore]] execution shape with the md5 stand-in weights
    * replaced by weights LEARNED on this corpus by fixed-iteration
    * distributed gradient descent — the fasttext-style linear
    * classifier pipeline end to end (hash features → train → score →
    * gate), under the Lloyd discipline that makes the k-means tiers
    * oracle-checkable: exact integer partial sums, a FIXED number of
    * rounds, and truncating fixed-point division (Spark `div` and
    * DuckDB `//` both truncate toward zero), so every round — and
    * therefore the final weights, scores, and keep decisions — is
    * bit-replayable cross-engine.
    *
    * Model: per-token hash features c_ij = count of doc i's tokens in
    * bucket j (j = md5("qcls-"‖token) mod `d`); the regression target
    * is the doc's STOPWORD COUNT t_i — a quantity that IS a linear
    * function of the bucket counts (the stopword-indicator vector),
    * so the trainer has a planted ground truth to recover through
    * hash collisions. Each round is one step of steepest descent with
    * an EXACT LINE SEARCH on the squared loss — the textbook
    * no-tuning-parameter GD, chosen over a fixed learning rate because
    * the line-search step is itself exact integer arithmetic (so it
    * replays) and converges in a few rounds where fixed-η GD needs
    * tens (measured: corr 0.78 vs the 0.87 OLS ceiling at 2 rounds;
    * 0.31 for fixed-η at 4). Per round, with residual
    * r_i = scale·t_i − pred_i:
    *
    *   g_j   = Σ_i r_i·c_ij              (the ascent direction, XᵀR)
    *   u_j   = (g_j·U) div max_k |g_k|   (U-fixed-point unit direction)
    *   xu_i  = Σ_j c_ij·u_j              (X·u, per doc)
    *   a     = (Σ_i r_i·xu_i)·U div Σ_i xu_i²   (exact line search)
    *   w_j  += (a·u_j) div U
    *
    * Every division is truncating (Spark `div` = DuckDB `//`, both
    * toward zero — verified including negatives and HUGEINT), every
    * cross-doc sum is exact decimal(38,0), so the weights, scores and
    * keep decisions are bit-replayable; the DuckDB oracle unrolls the
    * rounds as CTE stages (the k-means precedent). A zero gradient or
    * zero step denominator (perfect fit) degrades to a no-op round via
    * the NULLIF guard. The reported score = pred_i/(scale·n_i) is the
    * predicted stopword RATIO; `keep` gates on the decimal(18,6)-
    * rounded score like every other boundary decision here. Zero-token
    * docs: NULL score, keep=false.
    *
    * Scale shape — canonical distributed GD: the corpus explodes to
    * (doc, bucket) counts ONCE (pinned, like the k-means assignment);
    * each round is three partial-agged shuffles of (doc)- or d-sized
    * rows (pred, gradient, X·u) with the d-row direction/weight tables
    * and the two line-search scalars riding as broadcasts; nothing
    * corpus-sized moves per round, and per-doc residuals pin per round
    * so the double use (gradient + step numerator) costs one
    * materialization, not two recomputes. Envelope: per-doc products
    * r·xu stay < 2^63 while scale·t·n·U < 9e18 (the decimal(38,0)
    * sums absorb corpus size); ANSI overflow is the loud guard.
    */
  def trainedClassifierScore(docs: DataFrame, d: Int = 256, rounds: Int = 3,
      scale: Long = 1000000L, threshold: Double = 0.08): DataFrame = {
    // round-19 optimization: score FROM the trainer's own pinned feature
    // matrix instead of [[classifierScoreWith]]'s fresh tokenize pass —
    // the coupled train+score used to scan the corpus twice (explode +
    // one md5 per token each time) to rebuild the exact (doc_id, b, c)
    // counts the trainer already holds. Σ_tokens coalesce(w,0) regrouped
    // by bucket is Σ_b c·w with w0 seeded over every bucket in feat, so
    // the integer sums (and the one double cast) are value-identical —
    // TextStatsParitySpec pins coupled == frozen-scoreWith equality.
    // At 100 TB this halves the trained pipeline's corpus passes.
    val (feat, lab) = classifierFeatures(docs, d)
    try {
      val w = trainClassifierRounds(feat, lab, rounds, scale)
      val scored = feat.join(broadcast(w), Seq("b"))
        .groupBy("doc_id").agg(sum(col("c") * col("w")).as("p"))
        .join(lab.select(col("doc_id"), col("n")), Seq("doc_id"))
      val out = graft.Staging.pin(docs.select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).as("n_tokens"),
          when(col("n") > 0,
            col("p").cast("double") / (col("n") * scale).cast("double"))
            .cast("decimal(18,6)").cast("double").as("score"))
        .withColumn("keep", coalesce(col("score") > lit(threshold), lit(false))))
      graft.Staging.unpin(w)
      out
    } finally {
      graft.Staging.unpin(feat)
      graft.Staging.unpin(lab)
    }
  }

  /** The hashed-feature bucket of a token — ONE definition shared by
    * the trainer and every scorer (drift here would silently score
    * with the wrong feature space).
    */
  private def qclsBucket(t: Column, d: Int): Column =
    conv(substring(md5(concat(lit("qcls-"), t)), 1, 15), 16, 10)
      .cast("long") % d

  /** Score a corpus with FROZEN classifier weights — the deployment
    * shape: train once ([[trainClassifierWeights]]), ship the d-row
    * weight table, score any corpus (batch or stream) map-side with
    * one broadcast join + one per-doc aggregate. No training rounds,
    * no labels.
    */
  def classifierScoreWith(docs: DataFrame, weights: DataFrame,
      d: Int = 256, scale: Long = 1000000L,
      threshold: Double = 0.08): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val scored = tok
      .select(col("doc_id"), qclsBucket(col("t"), d).as("b"))
      .join(broadcast(weights), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("w"), lit(0L))).as("p"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        when(col("n") > 0,
          col("p").cast("double") / (col("n") * scale).cast("double"))
          .cast("decimal(18,6)").cast("double").as("score"))
      .withColumn("keep", coalesce(col("score") > lit(threshold), lit(false)))
  }

  /** ROW-LOCAL frozen scoring — the STREAMING shape: the weight table
    * collapses to a one-row broadcast map frame (the stripParagraphs /
    * PQ-codebook param-frame idiom) and the whole score computes per
    * row as a token-array fold — no explode, no per-doc groupBy — so
    * it runs inside an append-mode streaming query (a streamed corpus
    * gate needs no shuffle and no state) and emits the same schema and
    * values as [[classifierScoreWith]] (exact integer sum, regrouped).
    * The per-token fold is the interpreted HOF form (one md5 per
    * token); at batch scale prefer [[classifierScoreWith]]'s joined
    * plan — this variant exists for streams and is value-pinned to the
    * batch scorer by spec.
    */
  def classifierScoreRowLocal(docs: DataFrame, weights: DataFrame,
      d: Int = 256, scale: Long = 1000000L,
      threshold: Double = 0.08): DataFrame =
    docs.crossJoin(broadcast(weightsMapFrame(weights)))
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        rowLocalScore(col("__wm"), col("text"), d, scale).as("score"))
      .withColumn("keep", coalesce(col("score") > lit(threshold), lit(false)))

  /** The weight table as a one-row broadcastable map frame (column
    * `__wm`) — shared by the row-local scorer and the curation gate.
    */
  private[graft] def weightsMapFrame(weights: DataFrame): DataFrame =
    weights.agg(
      map_from_entries(collect_list(struct(col("b"), col("w")))).as("__wm"))

  /** The row-local score expression over a weights-map column: exact
    * integer token fold, decimal(18,6)-rounded double out (NULL for
    * zero-token text) — value-identical to the joined batch scorer.
    */
  private[graft] def rowLocalScore(wm: Column, text: Column, d: Int,
      scale: Long): Column = {
    val toks = tokens(text)
    val p = aggregate(toks, lit(0L), (acc, t) =>
      acc + coalesce(element_at(wm, qclsBucket(t, d)), lit(0L)))
    when(size(toks) > 0,
      p.cast("double") / (size(toks).cast("long") * scale).cast("double"))
      .cast("decimal(18,6)").cast("double")
  }

  /** A FROZEN-classifier keep gate as a composable stage (the
    * [[graft.pipeline.Curation]] `extraGate` seam): filters to rows
    * whose row-local score clears `threshold`. Pure projection +
    * filter over a broadcast one-row map frame — runs unchanged inside
    * an append-mode stream, so the batch and streamed curation
    * pipelines gate with the SAME trained model.
    */
  def frozenClassifierGate(weights: DataFrame, d: Int = 256,
      scale: Long = 1000000L, threshold: Double = 0.08)
      : DataFrame => DataFrame = { df =>
    df.crossJoin(broadcast(weightsMapFrame(weights)))
      .filter(coalesce(
        rowLocalScore(col("__wm"), col("text"), d, scale) > lit(threshold),
        lit(false)))
      .drop("__wm")
  }

  /** The training loop alone: returns the PINNED d-row (b, w) weight
    * table (caller unpins when done, or lets the session carry it —
    * it is the model artifact a deployment persists).
    *
    * NOTE on scoring parity: this trainer's per-doc prediction is
    * Σ_j c_ij·w_j; [[classifierScoreWith]] computes the same sum as
    * Σ_tokens w_{bucket(t)} (one row per token, weights joined then
    * summed) — identical by regrouping, exact in integers.
    */
  def trainClassifierWeights(docs: DataFrame, d: Int = 256,
      rounds: Int = 3, scale: Long = 1000000L): DataFrame = {
    val (feat, lab) = classifierFeatures(docs, d)
    try trainClassifierRounds(feat, lab, rounds, scale)
    finally {
      graft.Staging.unpin(feat)
      graft.Staging.unpin(lab)
    }
  }

  /** The trainer's pinned inputs, shared with the coupled scorer: the
    * hashed feature matrix (doc_id, b, c) and the per-doc label row
    * (doc_id, n, t) — ONE corpus tokenize pass builds both. Callers own
    * the unpin.
    */
  private def classifierFeatures(docs: DataFrame, d: Int)
      : (DataFrame, DataFrame) = {
    require(d >= 2, s"need d >= 2; got $d")
    val spark = docs.sparkSession
    def pin(df: DataFrame): DataFrame = graft.Staging.pin(df)
    val para = spark.sparkContext.defaultParallelism
    val tok = docs.repartition(para)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    // per-(doc, bucket) counts — the hashed feature matrix, built once
    val feat = pin(tok
      .select(col("doc_id"), qclsBucket(col("t"), d).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c")))
    // per-doc label row: token count + stopword count (the target)
    val lab = pin(tok.groupBy("doc_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("t").isin(stopwords.map(lit): _*), 1L).otherwise(0L))
        .as("t")))
    (feat, lab)
  }

  /** The gradient-descent rounds over a prebuilt feature matrix — the
    * [[trainClassifierWeights]] loop body, extracted so the coupled
    * scorer can reuse the pinned `feat`/`lab` instead of re-tokenizing.
    *
    * Round-19 shape: the weight/direction vectors are d-row frames —
    * driver-sized BY DESIGN (d is a model hyperparameter, hundreds to
    * thousands) — yet each round used to localCheckpoint three of them
    * and build three broadcast relations, ~10 Spark actions per round
    * of pure fixed cost. The d-scale arithmetic (gmax normalization,
    * the line-search step, the weight update) now runs driver-side in
    * exact BigInteger — `divide` truncates toward zero exactly like
    * Spark's IntegralDivide on decimals (Decimal.quot →
    * divideToIntegralValue), so every value is bit-identical (the
    * oracle unrolls the full training loop as CTEs and hash-checks it).
    * The corpus-scale work (residuals, XᵀR, Xu — the sums that grow
    * with the data) stays in Spark untouched: 3 actions per round
    * (res pin + two aggregates) instead of ~10.
    */
  private def trainClassifierRounds(feat: DataFrame, lab: DataFrame,
      rounds: Int, scale: Long): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1; got $rounds")
    val spark = feat.sparkSession
    import spark.implicits._
    val u0 = 1000000L // direction fixed-point scale U
    def pin(df: DataFrame): DataFrame = graft.Staging.pin(df)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    import java.math.BigInteger
    val ZERO = BigInteger.ZERO
    // the hashed-bucket universe actually present in the corpus — the
    // same set the old w0 = feat.select("b").distinct() carried. Loud
    // envelope guard (the langid-marginals rule): the weight vector is
    // driver-resident by design; a caller hashing into millions of
    // buckets should shard the model instead
    val buckets = feat.select("b").distinct()
      .collect().map(_.getLong(0)).sorted
    require(buckets.length <= (1 << 20),
      s"classifier weight vector has ${buckets.length} buckets — beyond " +
        "the driver-resident envelope (d is a model hyperparameter; " +
        "shard the feature space instead)")
    var w: Map[Long, Long] = buckets.iterator.map(_ -> 0L).toMap
    def asFrame(v: Map[Long, Long], valName: String): DataFrame =
      buckets.map(b => (b, v(b))).toSeq.toDF("b", valName)
    (1 to rounds).foreach { _ =>
      // residual r_i = scale·t_i − Σ c·w, pinned: used by both the
      // gradient and the line-search numerator (corpus-scale, stays
      // in Spark)
      val res = pin(feat.join(broadcast(asFrame(w, "w")), Seq("b"))
        .groupBy("doc_id").agg(sum(col("c") * col("w")).as("p"))
        .join(lab, Seq("doc_id"))
        .select(col("doc_id"), (lit(scale) * col("t") - col("p")).as("r")))
      // ascent direction g = XᵀR (exact decimal sums) — d rows, collected
      val g: Map[Long, BigInteger] = feat.join(res, Seq("doc_id"))
        .groupBy("b").agg(sum(dec(col("r") * col("c"))).as("g"))
        .collect().iterator
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) ZERO else r.getDecimal(1).toBigIntegerExact))
        .toMap
      val gmax = g.valuesIterator.map(_.abs)
        .foldLeft(ZERO)((a, x) => if (x.compareTo(a) > 0) x else a)
      // u = (g·U) div gmax, exact integral division truncating toward
      // zero — Spark's `div` semantics
      val uVec: Map[Long, Long] = buckets.iterator.map { b =>
        val gb = g.getOrElse(b, ZERO)
        b -> (if (gmax.signum == 0) 0L
          else gb.multiply(BigInteger.valueOf(u0)).divide(gmax).longValueExact)
      }.toMap
      // exact line search along u: a = (RᵀXu · U) div ‖Xu‖² — one
      // corpus-scale aggregate, one row collected
      val ab = feat.join(broadcast(asFrame(uVec, "u")), Seq("b"))
        .groupBy("doc_id").agg(sum(col("c") * col("u")).as("xu"))
        .join(res, Seq("doc_id"))
        .agg(sum(dec(col("r")) * dec(col("xu"))).as("num"),
          sum(dec(col("xu")) * dec(col("xu"))).as("den"))
        .collect()(0)
      val a: BigInteger =
        if (ab.isNullAt(1) || ab.getDecimal(1).signum == 0) ZERO
        else (if (ab.isNullAt(0)) ZERO else ab.getDecimal(0).toBigIntegerExact)
          .multiply(BigInteger.valueOf(u0))
          .divide(ab.getDecimal(1).toBigIntegerExact)
      w = buckets.iterator.map { b =>
        val step = a.multiply(BigInteger.valueOf(uVec(b)))
          .divide(BigInteger.valueOf(u0))
        b -> (w(b) + step.longValueExact)
      }.toMap
      graft.Staging.unpin(res)
    }
    asFrame(w, "w")
  }

  /** Language ID, n-gram/marker-word heuristic: score each candidate
    * language by its marker-token hits, pick the argmax (ties broken by
    * language code order). Real corpora would use character n-gram
    * profiles; the shape — per-language score then argmax — is the same
    * and stays a single codegen'd projection.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "not", "this"),
    "es" -> Seq("el", "los", "que", "este"),
    "fr" -> Seq("le", "les", "que", "ce"),
    "zh" -> Seq("de", "shi", "bu", "zhe"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Predicted language from the single-pass stats kernel: argmax over
    * marker scores with tie priority de>en>es>fr>zh, "und" when no hits —
    * value-identical to langId (parity-tested) and to the DuckDB oracle's
    * CASE chain.
    */
  def langIdFast(text: Column): Column =
    langIdFromStats(graft.functions.VecText.text_stats(tokens(text)))

  /** The argmax/tie-break chain over a text_stats array's 5 marker
    * scores (elements 4..8; de>en>es>fr>zh priority, "und" on zero) —
    * ONE copy shared by [[langIdFast]], [[cleanCorpus]]'s gate, and
    * Curation.gates so the tie-break order cannot drift between the
    * reported operator and the gates that filter on it.
    */
  private[graft] def langIdFromStats(stats: Column): Column = {
    val s = (0 until 5).map(i => element_at(stats, lit(i + 4)))
    val g = greatest(s: _*)
    when(g === 0, lit("und"))
      .when(s(0) === g, lit("de")).when(s(1) === g, lit("en"))
      .when(s(2) === g, lit("es")).when(s(3) === g, lit("fr"))
      .otherwise(lit("zh"))
  }

  /** Predicted language = argmax over marker scores; falls back to "und"
    * (undetermined) when no marker hits at all. HOF reference
    * formulation — parity anchor for langIdFast.
    */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (lang, markers) =>
      struct(langScore(text, markers).as("score"),
        // invert code order so greatest() tie-breaks to the FIRST lang code
        lit(langMarkers.map(_._1).sorted.reverse.indexOf(lang)).as("pref"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** TRAINED language ID (round 18) — the [[langId]] heuristic's
    * learned twin: per-language smoothed unigram naive Bayes FIT on a
    * labeled corpus slice, with NO hand-built marker list. Train once
    * ([[trainLangModel]] — the shipped model artifact is one sparse
    * (lang, w, c) count table), then [[langIdWith]] scores any corpus
    * and predicts argmax Σ_tokens ⌊log2 p(w|l)⌋ with
    * p(w|l) = (c(l,w)+1)/(n_l+V) (add-one smoothing over the train
    * vocabulary), ties broken by language code.
    *
    * The FLOOR-LOG2 form is the hash-green trick: true NB needs
    * Σ log p, but ln is correctly-rounded in neither engine's
    * contract — while ⌊log2 x⌋ of a positive integer IS exact in both
    * (`length(bin(x)) - 1`; both engines' `bin` emit the minimal
    * binary form). So each token contributes the bit length of the
    * fixed-point probability (c+1)·scale div (n_l+V) — an exact
    * integer — and the per-doc sums are order-independent longs. The
    * 1-bit quantization even helps: shared-vocabulary words whose
    * per-language probabilities differ by < 2× contribute the SAME
    * floor-log2 to every candidate and cancel, so the decision rides
    * the genuinely discriminative tokens. Measured against the
    * planted labels at sf0.01: trained 191/500 vs the marker
    * heuristic's 160 and float-log NB's 165 (187 vs 146 at sf0.001;
    * TextStatsParitySpec pins the margin). The mean-inverse-1/p form
    * the LM operators use was REJECTED here: its linear n_l term
    * systematically favors low-mass languages (a probability, unlike
    * a surprisal score, must be compared across differently-sized
    * models). Docs with no tokens — or an EMPTY model — predict
    * "und", the heuristic's own fallback.
    *
    * Scale shape: training is ONE exploded-token groupBy (map-side
    * partials). Scoring multiplies the token stream by |L| candidate
    * languages (the decision's inherent shape — every candidate must
    * price every token; |L| ≈ 10² in real corpora) via a broadcast
    * |L|-row marginals frame, joins the sparse model on (lang, w) — a
    * KEYED join, the model of a 100 TB corpus is itself large — and
    * reduces per (doc, lang) with one partial-agged shuffle.
    * Envelope (loud require): `scale` > max(n_l)+V so no probability
    * floors to 0, and (c+1)·scale < 2^63 — at corpora past ~2^42
    * train tokens per language move the product to decimal(38,0)
    * (both engines keep it exact, the classifier's discipline).
    */
  def trainLangModel(labeled: DataFrame): DataFrame =
    labeled.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))

  /** The per-language marginals (lang, n_l, V), COLLECTED — |L| rows,
    * bounded by the label-set size — so one model scan drives both the
    * envelope guard and the broadcast candidate frame (re-deriving
    * them as plans re-ran the whole training aggregation per use).
    * The guard is BOTH halves of the documented envelope, loudly:
    * a scale at-or-below any n_l+V floors rare probabilities to 0
    * (silently collapsing their distinctions), and a (c+1)·scale
    * product past 2^63 would overflow (ANSI throws mid-job;
    * max(c) <= max(n_l), so the marginals bound it).
    */
  private def langMarginalRows(model: DataFrame, scale: Long,
      who: String): Seq[(String, Long, Long)] = {
    val rows = model.groupBy("lang").agg(sum("c").as("n_l"))
      .crossJoin(model.agg(count_distinct(col("w")).as("v")))
      .select("lang", "n_l", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    rows.foreach { case (l, nl, v) =>
      require(scale > nl + v,
        s"$who: scale=$scale must exceed n_l+V=${nl + v} (lang=$l) or " +
          "rare-word probabilities floor to 0 — raise scale")
      require(nl + 1L <= Long.MaxValue / scale,
        s"$who: (c+1)*scale can reach ${nl + 1L}*$scale and overflow " +
          s"2^63 (lang=$l) — move the product to decimal(38,0), the " +
          "classifier's discipline")
    }
    rows
  }

  /** The quantized ⌊log2⌋ of a fixed-point smoothed probability —
    * ONE definition shared by the joined scorer and the row-local map
    * frame (the parity pin depends on the two staying bit-identical).
    * `numSql` is the (c+1)-style numerator over columns in scope;
    * `n_l`/`v` must be in scope.
    */
  private def lgQuant(numSql: String, scale: Long): Column =
    length(bin(expr(s"(($numSql) * ${scale}L) div (n_l + v)")))
      .cast("long") - 1L

  /** Predict with a FROZEN language model — the deployment shape:
    * returns (doc_id, lang_pred). Marginals (per-language mass, global
    * vocabulary size) derive from the model table in one collected
    * |L|-row pass; the model itself never re-trains here.
    */
  def langIdWith(docs: DataFrame, model: DataFrame,
      scale: Long = 1L << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the model plan executes ONCE: the marginals collect below and the
    // scoring join's build side both read the checkpointed blocks. An
    // un-checkpointed `model` — typically the trainLangModel aggregation
    // — would re-run its corpus-scale training shuffle for each of the
    // two consumers (the r18 advice finding; TrainScale did this
    // manually). Lineage is deliberately cut, values unchanged; the
    // blocks are model-sized (vocab × |L|) and the ContextCleaner
    // reclaims them when the plan is dropped.
    val m = model.localCheckpoint()
    val langs = broadcast(
      langMarginalRows(m, scale, "langIdWith")
        .toDF("cand", "n_l", "v"))
    val scored = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .crossJoin(langs)
      .join(m.select(col("lang").as("cand"), col("w"), col("c")),
        Seq("cand", "w"), "left")
      .select(col("doc_id"), col("cand"),
        lgQuant("coalesce(c, 0L) + 1L", scale).as("lg"))
      .groupBy("doc_id", "cand")
      .agg(sum("lg").as("s_sum"))
    // argmax with lexicographic tie-break = min over (-s_sum, cand)
    val best = scored.groupBy("doc_id")
      .agg(min(struct((-col("s_sum")).as("neg"), col("cand"))).as("b"))
      .select(col("doc_id"), col("b.cand").as("lang_pred"))
    docs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"))
  }

  /** Train-and-predict in one call: fit on the `trainPredicate` slice
    * (an 80/20-style split leaves held-out docs the spec checks
    * generalization on), predict every doc.
    */
  def trainedLangId(docs: DataFrame, trainPredicate: Column,
      scale: Long = 1L << 20): DataFrame =
    langIdWith(docs, trainLangModel(docs.filter(trainPredicate)), scale)

  /** The trained language model as ONE broadcastable row — the
    * classical shipped-langid artifact: a per-word table of QUANTIZED
    * LOG-PROBABILITIES. Columns: `__langs` (sorted label set),
    * `__lg0` (per-language ⌊log2⌋ smoothing floor for unseen words,
    * aligned), `__lm` (word → per-language ⌊log2 p(w|l)⌋ map). All
    * division happens HERE, in a normal batch plan — the row-local
    * scorer's per-token fold is then pure addition, which is what
    * lets it run inside an append-mode stream.
    */
  private[graft] def langModelMapFrame(model: DataFrame,
      scale: Long): DataFrame = {
    val spark = model.sparkSession
    import spark.implicits._
    // one model execution for the marginals collect AND the lmRow
    // aggregation below — the langIdWith rationale verbatim
    val m = model.localCheckpoint()
    // shared collected marginals: one model scan, both envelope guards
    val perLang = broadcast(
      langMarginalRows(m, scale, "langModelMapFrame")
        .toDF("lang", "n_l", "v"))
    val defRow = perLang.select(col("lang"), lgQuant("1L", scale).as("lg"))
      .agg(
        transform(array_sort(collect_list(struct(col("lang"), col("lg")))),
          s => s.getField("lang")).as("__langs"),
        transform(array_sort(collect_list(struct(col("lang"), col("lg")))),
          s => s.getField("lg")).as("__lg0"))
    val lmRow = m.join(perLang, Seq("lang"))
      .select(col("w"), col("lang"), lgQuant("c + 1L", scale).as("lg"))
      .groupBy("w")
      .agg(map_from_entries(
        collect_list(struct(col("lang"), col("lg")))).as("cm"))
      .agg(map_from_entries(
        collect_list(struct(col("w"), col("cm")))).as("__lm"))
    defRow.crossJoin(lmRow)
  }

  /** ROW-LOCAL frozen language ID — the STREAMING shape: the model
    * rides as one broadcast row ([[langModelMapFrame]]) and the whole
    * decision computes per document as a token fold over an |L|-long
    * accumulator (zip_with adds each token's per-language quantized
    * log-probabilities) followed by an argmax whose first-index
    * semantics IS the lexicographic tie-break (`__langs` is sorted).
    * No explode, no per-doc groupBy — so it runs inside an append-mode
    * streaming query, and emits values identical to [[langIdWith]]
    * (TextStatsParitySpec pins the parity). Same deployment trade as
    * [[classifierScoreRowLocal]]: at batch scale prefer the joined
    * plan; this exists for streams.
    */
  def langIdRowLocal(docs: DataFrame, model: DataFrame,
      scale: Long = 1L << 20): DataFrame = {
    // scorer-unique scratch names, the frozenLangGate rule: the map
    // frame's generic __langs/__lg0/__lm would collide ambiguously
    // with an input that happens to carry them
    val lidCols = Seq("__langs" -> "__lid_langs",
      "__lg0" -> "__lid_lg0", "__lm" -> "__lid_lm")
    val clash = docs.columns.filter(lidCols.map(_._2).contains)
    require(clash.isEmpty,
      s"langIdRowLocal: input carries scorer scratch column(s) " +
        s"[${clash.mkString(", ")}] — rename them before scoring")
    val mf = langModelMapFrame(model, scale)
      .select(lidCols.map { case (f, t) => col(f).as(t) }: _*)
    docs.crossJoin(broadcast(mf))
      .select(col("doc_id"),
        langRowLocalPred(col("__lid_langs"), col("__lid_lg0"),
          col("__lid_lm"), col("text")).as("lang_pred"))
  }

  /** A FROZEN-langid keep gate as a composable stage (the
    * [[graft.pipeline.Curation]] `extraGate` seam, like
    * [[frozenClassifierGate]]): filters to rows whose predicted
    * language is in `keep` — the [[langIdRowLocal]] decision verbatim,
    * so it is a pure projection + filter over one broadcast model row
    * and the batch and streamed pipelines gate with the SAME trained
    * model. A doc with no tokens predicts "und" and passes only if
    * "und" ∈ keep.
    */
  def frozenLangGate(model: DataFrame, keep: Set[String],
      scale: Long = 1L << 20): DataFrame => DataFrame = {
    require(keep.nonEmpty, "frozenLangGate: empty keep set gates out " +
      "every document — pass the language codes to retain")
    // the map frame COLLECTS once at gate construction: a lazy plan
    // here would re-run the whole model aggregation on every action —
    // and on every micro-batch when the gate sits in a streaming leg
    // (a stream-static cross join re-evaluates the static subtree per
    // batch). Collecting is no new cost class: broadcasting this row
    // collects it to the driver anyway, and the row is the model
    // artifact (vocabulary-sized — the row-local design's own bound).
    val spark = model.sparkSession
    val mfLazy = langModelMapFrame(model, scale)
    val mfRow = mfLazy.head()
    // GATE-UNIQUE column names (r18 advice): the map frame's generic
    // __langs/__lg0/__lm would collide ambiguously with an input that
    // happens to carry them (another gate's scratch, a hand-built
    // frame) — alias before the crossJoin and refuse the (vanishingly
    // unlikely) residual collision loudly instead of clobbering
    val gateCols = Seq("__langs" -> "__lang_gate_langs",
      "__lg0" -> "__lang_gate_lg0", "__lm" -> "__lang_gate_lm")
    val mf = broadcast(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(mfRow)).asJava), mfLazy.schema))
      .select(gateCols.map { case (f, t) => col(f).as(t) }: _*)
    df => {
      val clash = df.columns.filter(gateCols.map(_._2).contains)
      require(clash.isEmpty,
        s"frozenLangGate: input carries gate scratch column(s) " +
          s"[${clash.mkString(", ")}] — rename them before the gate")
      df.crossJoin(mf)
        .filter(langRowLocalPred(col("__lang_gate_langs"),
          col("__lang_gate_lg0"), col("__lang_gate_lm"),
          col("text")).isin(keep.toSeq.sorted: _*))
        .drop(gateCols.map(_._2): _*)
    }
  }

  /** The row-local decision expression over the map-frame columns:
    * fold tokens into per-language score sums, argmax, first-index
    * tie-break, "und" for zero tokens or an empty model.
    */
  private[graft] def langRowLocalPred(langs: Column, lg0: Column,
      lm: Column, text: Column): Column = {
    val toks = tokens(text)
    // try_element_at throughout: missing words (and a word unseen in
    // SOME languages) are the norm, and ANSI element_at would throw
    val folded = aggregate(toks, transform(langs, _ => lit(0L)),
      (acc, t) => zip_with(acc,
        zip_with(langs, lg0, (l, d) =>
          coalesce(try_element_at(try_element_at(lm, t), l), d)),
        (a, b) => a + b))
    when(size(toks) > 0 && size(langs) > 0,
      element_at(langs,
        array_position(folded, array_max(folded)).cast("int")))
      .otherwise(lit("und"))
  }

  /** Exact document fingerprint: md5 of whitespace-normalized lowercase
    * text. Engine-independent, so it doubles as the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), " +", " "))

  /** The composed training-data cleaning pipeline — the use-case the
    * engine exists for: quality-gate → language-gate → exact-dedup
    * survivors, in one declarative plan (single scan; the dedup window is
    * the only shuffle). Thresholds are parameters of the corpus policy.
    */
  def cleanCorpus(
      docs: DataFrame,
      minTokens: Long = 10,
      maxStopwordRatio: Double = 0.5): DataFrame = {
    val gated = docs
      .withColumn("st", graft.functions.VecText.text_stats(tokens(col("text"))))
      .withColumn("n_tokens", element_at(col("st"), 1))
      // guarded: ANSI double /0 throws — empty docs get NULL and fail
      // the gate (DuckDB's /0 is NULL, so the oracle agrees)
      .withColumn("stopword_ratio",
        when(element_at(col("st"), 1) > 0,
          element_at(col("st"), 2).cast("double") / element_at(col("st"), 1).cast("double"))
          .cast("decimal(18,6)"))
      .withColumn("lang_pred", langIdFromStats(col("st")))
      .filter(col("n_tokens") >= minTokens
        && col("stopword_ratio") <= maxStopwordRatio
        && col("lang_pred") =!= "und")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fingerprint(col("text"))).orderBy(col("doc_id"))
    gated.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      // the quality gate compares the decimal(18,6)-rounded ratio (matching
      // the oracle's filter); only the OUTPUT representation is double
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("stopword_ratio").cast("double").as("stopword_ratio"))
  }

  /** Top-k characteristic terms per document, tf-idf family. The weight is
    * the smoothed RATIONAL idf, tf·(N+1)/(df+1), not tf·log(N/df): the two
    * agree that rarer terms rank higher, but log is libm-dependent (Spark's
    * Java Math.log and an oracle's C log can differ in the last ulp),
    * while bigint→double conversion and one IEEE division are correctly
    * rounded everywhere — so scores are bit-identical cross-engine and the
    * operator stays hash-checkable. Rank ties break on the term.
    *
    * Scale shape: token explode + (doc,term) count are map-side-partial;
    * the df table is |vocab|-sized (broadcastable); the per-doc top-k
    * window prunes map-side via InferWindowGroupLimit.
    */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // spread the pre-fan-out side first: a small corpus arrives as one file
    // split, and the term explode would otherwise run on a single task
    val para = docs.sparkSession.sparkContext.defaultParallelism
    val tf = docs.repartition(para)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * (col("n_docs") + 1)).cast("double")
          / (col("df") + 1).cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "tf", "df", "score")
  }

  /** Per-group length-outlier filter — the standard corpus length gate:
    * keep documents whose length lies within the [lo, hi] exact
    * percentiles OF THEIR OWN GROUP (a fixed global bound is wrong when
    * languages have different natural length distributions).
    *
    * Scale shape: one tiny per-group percentile aggregate (exact
    * percentile = one sort per group, |groups| output rows), broadcast
    * back; the filter itself is map-side. Bounds round through
    * decimal(18,6) so both engines compare against identical numbers
    * (exact-percentile interpolation can differ by an ulp).
    */
  def lengthOutlierFilter(
      docs: DataFrame,
      group: Column,
      lo: Double = 0.02,
      hi: Double = 0.98): DataFrame = {
    val bounds = docs.groupBy(group.as("len_g"))
      .agg(
        expr(s"percentile(n_chars, $lo)").cast("decimal(18,6)")
          .cast("double").as("len_lo"),
        expr(s"percentile(n_chars, $hi)").cast("decimal(18,6)")
          .cast("double").as("len_hi"))
    docs.join(broadcast(bounds), group === col("len_g"))
      .filter(col("n_chars") >= col("len_lo") && col("n_chars") <= col("len_hi"))
      .drop("len_g")
  }

  /** Deterministic count-min sketch over corpus term frequencies
    * (Cormode–Muthukrishnan): d rows × w columns, cell hash j of a term
    * = md5("cm-j-" ‖ term) mod w. The estimate upper-bounds the true
    * count — est(t) = min_j cells[j][h_j(t)] ≥ tf(t), overestimating by
    * < 2·N/w with probability 1 − 2^−d — and NEVER underestimates.
    *
    * Unlike the HLL/KLL sketches (engine-internal binary layouts, no
    * cross-engine oracle possible), a CMS with fixed md5 hashing is a
    * pure function of the data: the DuckDB oracle replays the exact
    * sketch cell by cell, so this approximate operator is fully
    * hash-checked rather than rows-only.
    *
    * Scale shape: term frequencies partial-agg map-side (the vocab-sized
    * shuffle exact counting needs anyway); the sketch is a second tiny
    * aggregate (≤ d·w rows); probes join the broadcast sketch. At 100 TB
    * the sketch is d·w longs — 32 KiB at the defaults — which is the
    * point: a frequency oracle that ships anywhere, and merges across
    * corpus shards by cell-wise addition.
    */
  def countMinFrequencies(
      docs: DataFrame,
      probes: Seq[String],
      d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1 and w >= 2; got d=$d, w=$w")
    require(probes.nonEmpty, "need at least one probe term")
    val spark = docs.sparkSession
    import spark.implicits._
    def cell(term: Column, j: Int): Column =
      conv(substring(md5(concat(lit(s"cm-$j-"), term)), 1, 15), 16, 10)
        .cast("long") % w
    val para = spark.sparkContext.defaultParallelism
    val tf = docs.repartition(para)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val cells = tf
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), cell(col("term"), j).as("cell"), col("tf"))): _*)).as("z"))
      .groupBy(col("z.row").as("row"), col("z.cell").as("cell"))
      .agg(sum(col("z.tf")).as("cnt"))
    val probeDf = probes.toDF("term")
    val probeCells = probeDf.select(col("term"),
      explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), cell(col("term"), j).as("cell"))): _*)).as("z"))
      .select(col("term"), col("z.row").as("row"), col("z.cell").as("cell"))
    // LEFT join: a probe hashing into an untouched cell reads 0 — an
    // inner join would silently take the min over non-empty cells only
    // and break the est ≥ tf guarantee's other face (est = 0 for terms
    // provably absent)
    val est = probeCells.join(broadcast(cells), Seq("row", "cell"), "left")
      .groupBy("term").agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
    probeDf.join(est, Seq("term"), "left")
      .join(tf.filter(col("term").isin(probes.map(lit): _*)), Seq("term"), "left")
      .select(col("term"), col("cm_est"),
        coalesce(col("tf"), lit(0L)).as("n_exact"))
  }

  /** PII redaction rules: (count column, regex, replacement tag). The
    * standard pre-training privacy pass — emails, phone numbers, IPv4
    * addresses and long ID-like digit runs are tagged before a corpus
    * ships. Patterns stay inside the regex subset where Java (Spark's
    * `regexp_replace`) and RE2 (the DuckDB oracle) agree — character
    * classes and bounded repetition only; no backreferences, no
    * lookaround, no word boundaries. Rule order matters: the generic
    * long-digit-run rule runs LAST so emails/phones/IPs are tagged by
    * their specific rule first (tags themselves contain no digits, so
    * later rules cannot re-match earlier redactions).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("n_emails", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("n_phones", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("n_ips", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("n_ids", "[0-9]{9,}", "<ID>"))

  /** Redacted text: every [[piiPatterns]] rule applied in order as a
    * `regexp_replace` chain. Pure codegen'd projection — map-side only;
    * at 100 TB the cost is one compiled-regex pass per rule per row,
    * with no shuffle and nothing collected.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-category PII match counts, measured on the RAW text: counting
    * after redaction would undercount wherever one rule's match contains
    * digits another rule would also have matched. The flip side is
    * deliberate too: rules count INDEPENDENTLY, so one character run can
    * land in two categories (a 9+-digit run inside an email counts as
    * both n_emails and n_ids) — per-category totals answer "how often
    * does rule X fire", not "how many distinct PII substrings exist".
    */
  def piiCounts(text: Column): Seq[Column] =
    piiPatterns.map { case (name, pat, _) =>
      regexp_count(text, lit(pat)).cast("long").as(name)
    }

  /** Rolling polynomial hash (Rabin-Karp style) over tokens — the
    * order-sensitive fingerprint variant: hash = (hash*31 + tokenHash)
    * mod 2^31-1 (Mersenne prime keeps the accumulator overflow-free under
    * Spark 4's ANSI arithmetic). The token hash is md5-derived (first 15
    * hex chars), so the fingerprint is engine-reproducible and
    * oracle-checked (DuckDB list_reduce over the same recurrence).
    */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // 2^31 - 1
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * lit(31L)
        + conv(substring(md5(t), 1, 15), 16, 10).cast("long") % p) % p)
  }

  /** Context-length chunking: split each document into fixed-`width`
    * character windows advancing by `stride` (stride < width ⇒
    * overlapping windows, the usual LM pretraining shape so no token
    * near a boundary loses its left context). Emits one row per chunk:
    * (doc_id, chunk_id, chunk_text, chunk_len).
    *
    * Chunk i covers [i·stride, i·stride+width); the last chunk starts at
    * the largest i with i·stride < len (so it may be short but never
    * empty), and an empty document still yields its one empty chunk —
    * row count is exactly Σ max(1, ⌈(len−width)/stride⌉+1).
    *
    * Scale: pure row-local fan-out — `sequence` + `posexplode` +
    * `substring`, whole-stage codegen, zero shuffle. Output size is
    * width/stride × corpus, the caller's knob. The n_chars column is
    * TRUSTED as the length (it matches length(text) in the test tables);
    * computing it inline would be the same plan.
    */
  def chunkDocuments(docs: DataFrame, width: Int = 200, stride: Int = 150): DataFrame = {
    require(width > 0 && stride > 0, s"width/stride must be positive: $width/$stride")
    val len = col("n_chars")
    // ⌈(len−width)/stride⌉ via integer floor-div on a non-negative
    // numerator, clamped at 0 for short docs
    val lastChunk = greatest(lit(0L), -floorDiv(-(len - width), lit(stride.toLong)))
    docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L), lastChunk)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("text").substr((col("pos") * stride + 1).cast("int"), lit(width))
          .as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Floor division a/b for long columns (Spark's `div` truncates toward
    * zero; chunking needs floor semantics for the negated-ceil trick).
    * The quotient is exact by construction, so the double round-trip is
    * lossless.
    */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** BM25-family ranked retrieval of documents against a small fixed
    * query — the relevance scorer a training-data pipeline uses to
    * weight a corpus against benchmark/reference queries (quality-biased
    * sampling, retrieval-augmented filtering).
    *
    * Okapi BM25 (Robertson et al.), with ONE deliberate substitution:
    * the idf factor is the raw Robertson odds `(N - df + 0.5)/(df + 0.5)`
    * rather than its logarithm. ln is monotone, so per-term orderings
    * are unchanged, and — the reason for the substitution — every
    * arithmetic op in the score is then +,-,×,÷ on exactly-represented
    * inputs: IEEE-identical across engines, so the whole scorer is
    * oracle-checkable by hash (ln is correctly-rounded in neither
    * engine's contract). A deployment wanting calibrated scores swaps
    * `ln(idf)` in — a one-line change that costs only the oracle.
    *
    * Plan shape: term frequencies and document length are row-local
    * (`filter` over the token array); the corpus statistics (N, Σdl,
    * per-term df) are ONE tiny aggregate broadcast back as a single
    * row — two corpus scans, zero shuffles of document rows. At 100 TB
    * the stats row is still one row; a deployment with a standing index
    * precomputes it.
    *
    * Scoring: k1 = 1.2, b = 0.75 (the standard defaults); terms
    * contribute left-to-right in the given order (deterministic sum).
    * Docs matching no query term are dropped (score 0).
    */
  def retrievalScore(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "retrievalScore needs at least one query term")
    // one single-pass kernel scan per row ([dl, tf...] — VecText.TermFreqs;
    // the HOF formulation re-tokenized per term and cost 2.9 s at sf0.1)
    val f = graft.functions.VecText.term_freqs(
      col("text"), array(terms.map(lit): _*))
    val withTf = docs
      .select(col("doc_id"), f.as("f"))
      .select(
        col("doc_id") +: element_at(col("f"), 1).as("dl") +:
          terms.indices.map(i => element_at(col("f"), i + 2).as(s"tf$i")): _*)
    val statCols = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n")
    val score = terms.indices.map { i =>
      val idf = (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
      val norm = col(s"tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) / norm
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(col("doc_id"),
        score.cast("decimal(18,6)").cast("double").as("score"))
  }

  /** Ordered word bigrams per document: (doc_id, w1, w2), one row per
    * adjacent token pair. Shared by the bigram LM operators below.
    */
  private def bigramPairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))

  /** CCNet-style LM quality gate: score every document by how SURPRISING
    * its word transitions are under a bigram model trained on a reference
    * subset (`refPredicate` — the "clean" slice, e.g. one language or a
    * vetted source). High surprisal = the doc's transitions rarely occur
    * in reference text — the perplexity-filtering signal, emitted as a
    * score so callers gate/weight/stratify downstream.
    *
    * Hash-green form: the score is the MEAN INVERSE smoothed transition
    * probability, not exp-mean-log perplexity — per bigram the model
    * assigns p = (c(w1,w2)+1)/(c(w1)+V) (add-one smoothing over the
    * reference vocabulary V; unseen w1 ⇒ c=0), and the doc aggregates
    * 1/p. The log/exp of true perplexity is deliberately absent: ln is
    * correctly-rounded in neither engine's contract, while this form is
    * all integer arithmetic until ONE final IEEE division — per bigram
    * the fixed-point term ((c(w1)+V)·scale) div (c(w1,w2)+1) is an exact
    * LONG, the per-doc sum of longs is order-independent (so the shuffle
    * needs no ordering discipline), and surprisal = sum/(n·scale) casts
    * once. Envelope: per-doc sums stay < 2^53 while
    * T·(c(w1)+V)·scale < 9e15 — at larger corpora lower `scale` or move
    * the sum to decimal(38,0) (both engines keep it exact).
    *
    * An EMPTY reference slice yields V = 0 and all-zero surprisal —
    * callers selecting the reference by predicate should sanity-check
    * coverage (the scores are meaningless, not wrong, under an empty
    * model; LmCurationSpec exercises the populated case).
    *
    * Scale shape — the canonical distributed n-gram LM build + score:
    * the model is one groupBy (w1,w2) over the reference's exploded
    * bigrams (map-side partials); scoring joins doc bigrams against the
    * model on the same key (the model is corpus-derived — potentially
    * huge — so this is a keyed join, NOT a broadcast; AQE may still
    * broadcast a small model at small SF, which is the optimizer's
    * call); the per-doc reduce is one more partial-agged shuffle.
    * Nothing quadratic, nothing driver-side; V rides as a broadcast
    * one-row frame.
    */
  def bigramSurprisal(docs: DataFrame, refPredicate: Column,
      scale: Long = 10000L): DataFrame = {
    val ref = docs.filter(refPredicate)
    val bigModel = bigramPairs(ref).groupBy("w1", "w2")
      .agg(count(lit(1)).as("cb"))
    val uniModel = ref
      .select(explode(tokens(col("text"))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val vRow = uniModel.agg(count(lit(1)).as("v"))
    bigramPairs(docs)
      .join(bigModel, Seq("w1", "w2"), "left")
      .join(uniModel, Seq("w1"), "left")
      .crossJoin(broadcast(vRow))
      .select(col("doc_id"),
        expr(s"((coalesce(cu, 0L) + v) * ${scale}L) div (coalesce(cb, 0L) + 1L)")
          .as("s_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("s_fp").as("s_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("s_sum").cast("double")
          / (col("n_bigrams") * scale).cast("double")).as("surprisal"))
  }

  /** DSIR-style importance weights (Xie et al. '23 shape): weight every
    * document by how much more likely its tokens are under a TARGET
    * unigram model (trained on the `targetPredicate` slice — the
    * distribution you want more of) than under the BACKGROUND model
    * (the whole corpus). Downstream, importance resampling feeds the
    * weight into the existing samplers ([[graft.sample.Sampling]]).
    *
    * Hash-green form: the weight is the MEAN token-level likelihood
    * ratio rather than the exp-sum-log form — per token the smoothed
    * ratio p_t/p_b = ((c_t(w)+1)·(N_b+V)) / ((c_b(w)+1)·(N_t+V)) is
    * computed in fixed point (one LONG floor-div after exact integer
    * products; envelope: (c_t+1)·(N_b+V)·scale < 2^63, per-doc sums
    * < 2^53 — same discipline as [[bigramSurprisal]]), summed
    * order-independently, divided once. The arithmetic-for-geometric
    * mean swap is monotone-equivalent for gating/stratifying use and is
    * what keeps the whole operator oracle-checkable.
    *
    * Scale shape: ONE exploded-token pass builds both models (the
    * target count is a conditional sum in the same groupBy(w) — not a
    * second scan); scoring joins tokens to the model on w (keyed join;
    * the model of a 100 TB corpus is itself large), then one per-doc
    * partial-agged reduce. N_t/N_b/V ride as one broadcast stats row.
    */
  def dsirWeights(docs: DataFrame, targetPredicate: Column,
      scale: Long = 10000L): DataFrame = {
    val toks = docs
      .select(col("doc_id"), targetPredicate.as("is_t"),
        explode(tokens(col("text"))).as("w"))
    val model = toks.groupBy("w")
      .agg(count(lit(1)).as("cb"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val stats = model
      .agg(sum("cb").as("nb"), sum("ct").as("nt"), count(lit(1)).as("v"))
    toks.select(col("doc_id"), col("w"))
      .join(model, Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr(s"((ct + 1L) * (nb + v) * ${scale}L) div ((cb + 1L) * (nt + v))")
          .as("r_fp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("r_fp").as("r_sum"))
      .select(col("doc_id"), col("n_tokens"),
        (col("r_sum").cast("double")
          / (col("n_tokens") * scale).cast("double")).as("dsir_w"))
  }

  /** CCNet-style paragraph-level boilerplate removal — the web-corpus
    * curation step BETWEEN span-level substring dedup and doc-level
    * dedup: navigation bars, cookie banners, footers repeat VERBATIM as
    * whole paragraphs across a site's pages, so hash each
    * whitespace-normalized paragraph, find hashes whose corpus
    * occurrence count exceeds `maxFreq`, and rebuild every document
    * with those paragraphs removed (order preserved).
    *
    * Scale shape: the ONLY shuffle is the paragraph-hash frequency
    * aggregate — compact md5 strings with map-side partial counts; the
    * corpus itself never shuffles. The frequent-hash set is bounded by
    * corpus_paragraphs / maxFreq and in practice tiny (boilerplate is by
    * definition a small set repeated massively), so it rides as ONE
    * broadcast one-row array frame — the same broadcast-param-frame
    * idiom as the PQ codebooks — and the rebuild is a pure map-side
    * `filter`/`array_join` over each document row. At 100 TB the
    * frequency agg reads hashes only (no text movement), and a set too
    * large to broadcast would mean `maxFreq` is misconfigured, not that
    * the algorithm needs a corpus shuffle.
    *
    * Determinism: md5 over a canonical normal form (trim, collapse
    * whitespace runs, lowercase) — both engines replay it exactly, so
    * the whole operator is hash-checkable.
    */
  def removeBoilerplateParagraphs(docs: DataFrame, maxFreq: Long = 20,
      sep: String = "\n\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val freqSet = docs
      .select(explode(split(col("text"), sepRe)).as("para"))
      .select(paraNormHash(col("para")).as("ph"))
      .groupBy("ph").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxFreq)
      .agg(array_sort(collect_list(col("ph"))).as("bp"))
    stripParagraphs(docs, freqSet, sep)
  }

  /** The canonical paragraph normal form + hash shared by the batch
    * operator and [[StreamingBoilerplate]]'s maintained counts — ONE
    * definition, so streamed and batch frequent sets are definitionally
    * the same function of the corpus.
    */
  private[graft] def paraNormHash(p: Column): Column =
    md5(lower(regexp_replace(trim(p), "\\s+", " ")))

  /** Rebuild every document with the paragraphs whose normal-form hash
    * is in `freqSet`'s one-row `bp` array removed (order preserved) —
    * the shared map-side tail of batch and streaming boilerplate
    * removal. `freqSet` rides as a broadcast one-row param frame.
    */
  private[graft] def stripParagraphs(docs: DataFrame, freqSet: DataFrame,
      sep: String): DataFrame = {
    val paras = split(col("text"), java.util.regex.Pattern.quote(sep))
    val kept = filter(paras, p => !array_contains(col("bp"), paraNormHash(p)))
    docs.crossJoin(broadcast(freqSet))
      .select(col("doc_id"),
        array_join(kept, sep).as("clean_text"),
        size(paras).cast("long").as("n_paras"),
        (size(paras) - size(kept)).cast("long").as("n_dropped"))
  }

  // ─────────────────────────────── BPE trainer + encoder (round 18)

  /** Symbol-sequence wire form shared by the BPE trainer and both
    * engines' oracles: each symbol wrapped in its own delimiters,
    * `"abc" → "|a||b||c|"`. Why this exact form: applying one merge
    * `(l, r) → lr` is then a plain left-to-right non-overlapping
    * string `replace(s, "|l||r|", "|lr|")` — and because every symbol
    * carries BOTH its delimiters, adjacent merge sites share no
    * characters, so `replace`'s greedy scan IS the canonical BPE merge
    * pass (`"a a a"`: first pair merges, third symbol survives) and it
    * replays identically in Spark and DuckDB. Assumes tokens do not
    * contain `'|'` (true of the corpus; a deployment picks any byte
    * outside its alphabet).
    */
  private def bpeWrap(word: Column): Column =
    regexp_replace(word, "(.)", "|$1|")

  /** The symbol ARRAY of a wire-form string (strip the outer bars,
    * split on the doubled delimiter).
    */
  private def bpeSymbols(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), "\\|\\|")

  /** Train a BPE merge table: `merges` fixed rounds of the canonical
    * map-reduce pair-count loop over the corpus's DISTINCT words
    * (weighted by word frequency — the standard corpus-BPE setup).
    * Each round: one `groupBy(l, r)` over adjacent-symbol pairs (with
    * multiplicity: a pair occurring twice in one word counts twice per
    * word occurrence), argmax by (count, then lexicographic (l, r) —
    * the deterministic tie-break), then a MAP-SIDE merge of the
    * winning pair in every word via the wire-form `replace`. Returns
    * `(round, lhs, rhs, merged, pair_count)` — one row per landed
    * merge; training stops early when no pair remains.
    *
    * Scale shape — what makes distributed BPE viable at 100 TB: the
    * CORPUS is touched once (the word-frequency groupBy every text
    * operator here already pays); all `merges` rounds then run over
    * the VOCABULARY (distinct words — millions of rows, not billions),
    * shuffling only pair-count partials per round, with the single
    * winning pair crossing to the driver (one Row per round — the
    * Lloyd-discipline coordination cost, same as a k-means centroid
    * pin). Exact long counts + lexicographic ties ⇒ every round is
    * bit-replayable; the DuckDB oracle unrolls the rounds as CTEs.
    */
  def bpeVocab(docs: DataFrame, merges: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    // the merge table is the product here — skip the final syms pin
    val (table, syms) = bpeMergeRounds(docs, merges, materializeSyms = false)
    graft.Staging.unpin(syms)
    import spark.implicits._
    table.toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode the corpus with a freshly-trained `merges`-round merge
    * table: per document, `n_pieces` = Σ over its tokens of the
    * token's post-merge symbol count (the real subword budget the
    * [[subwordCount]] run-length proxy stood in for). Encoding is a
    * keyed join of exploded tokens against the |vocab|-sized encoded
    * word table plus one per-doc sum — the merge table itself never
    * touches the corpus rows. Zero-token docs: n_pieces 0.
    */
  def bpeEncode(docs: DataFrame, merges: Int = 8): DataFrame = {
    val (_, syms) = bpeMergeRounds(docs, merges)
    val enc = syms.select(col("word"),
      size(bpeSymbols(col("s"))).cast("long").as("n_p"))
    val out = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(enc, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p")).as("n_pieces"))
    // NOTE: `syms` stays pinned — the returned (lazy) plan reads it;
    // unpinning here would drop the checkpoint blocks before the
    // caller materializes (the trainCentroids rule: intermediates
    // unpin, the returned state does not)
    docs.select(col("doc_id")).join(out, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** Encode with an EXISTING merge table — the deployment shape: train
    * once ([[bpeVocab]]), persist the table, encode any corpus by
    * applying the merges IN ROUND ORDER to its distinct words
    * (map-side `replace` chain over the wire form — a merge table is
    * tens-to-thousands of rows, compiled into the projection), then
    * one keyed join + per-doc sum. No retraining, no pair counts.
    * `merges` is (lhs, rhs) in application order — pass
    * `bpeVocab(...)` output ordered by `round` through
    * [[bpeMergesOf]], or any externally-trained table.
    */
  def bpeEncodeWith(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(explode(tokens(col("text"))).as("word")).distinct()
    val encoded = merges.foldLeft(
      words.select(col("word"), bpeWrap(col("word")).as("s"))) {
      case (df, (l, r)) =>
        df.select(col("word"),
          replace(col("s"), lit(s"|$l||$r|"), lit(s"|$l$r|")).as("s"))
    }
    val enc = encoded.select(col("word"),
      size(bpeSymbols(col("s"))).cast("long").as("n_p"))
    val out = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(enc, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p")).as("n_pieces"))
    docs.select(col("doc_id")).join(out, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** The (lhs, rhs) application-order pairs of a [[bpeVocab]] table. */
  def bpeMergesOf(vocab: DataFrame): Seq[(String, String)] =
    vocab.orderBy("round").select("lhs", "rhs")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  /** ROW-LOCAL frozen BPE encode — the STREAMING shape completing the
    * trained trio ([[classifierScoreRowLocal]], [[langIdRowLocal]]):
    * the merge table is a driver-side constant already, so the whole
    * per-doc piece count compiles into ONE projection — a token fold
    * applying the merge chain per token (the identical `replace`
    * cascade [[bpeEncodeWith]] runs per distinct word) and summing
    * symbol counts. No explode, no distinct, no join, no per-doc
    * groupBy — runs inside an append-mode stream; value-pinned to the
    * batch encoder by BpeSpec. The batch trade is real and the
    * OPPOSITE of the classifier's: this form re-encodes every token
    * OCCURRENCE (duplicates included) while [[bpeEncodeWith]] encodes
    * each distinct word once and joins — prefer the joined plan at
    * corpus scale, this one on streams.
    */
  def bpeEncodeRowLocal(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = tokens(col("text"))
    val nPieces = aggregate(toks, lit(0L), (acc, t) => {
      val enc = merges.foldLeft(bpeWrap(t)) { case (s, (l, r)) =>
        replace(s, lit(s"|$l||$r|"), lit(s"|$l$r|"))
      }
      acc + size(bpeSymbols(enc)).cast("long")
    })
    // null text degrades like the joined encoder's left-join coalesce:
    // (0, 0), never null
    docs.select(col("doc_id"),
      coalesce(size(toks).cast("long"), lit(0L)).as("n_tokens"),
      coalesce(when(size(toks) > 0, nPieces), lit(0L)).as("n_pieces"))
  }

  /** The shared training loop: returns the merge table rows and the
    * PINNED final (word, cnt, s) vocabulary state (caller unpins).
    */
  private def bpeMergeRounds(docs: DataFrame, merges: Int,
      materializeSyms: Boolean = true)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1 (got $merges)")
    val spark = docs.sparkSession
    def pin(df: DataFrame): DataFrame = graft.Staging.pin(df)
    val para = spark.sparkContext.defaultParallelism
    // ONE pinned corpus-derived table; the merge rounds accumulate a
    // replace CHAIN over it instead of re-pinning per round (round-19
    // optimization: a localCheckpoint job per round materialized a
    // |vocab|-row projection whose recompute is a map-side string
    // replace — 8 pins bought nothing but jobs; the chain is linear, so
    // no stats blowup, and re-running k replaces per argmax is O(k²)
    // cheap string work over the distinct vocabulary, never the corpus)
    val base = pin(docs.repartition(para)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), bpeWrap(col("word")).as("s")))
    var syms = base
    val table = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= merges && !done) {
      val arr = bpeSymbols(col("s"))
      // guarded: sequence(1, 0) DESCENDS in Spark, so a single-symbol
      // word would index past the array (same guard as bigramPairs)
      val pairs = syms
        .select(col("cnt"), explode(
          when(size(arr) >= 2,
            transform(sequence(lit(1), size(arr) - 1),
              i => struct(element_at(arr, i).as("l"),
                element_at(arr, i + 1).as("r"))))
            .otherwise(array())).as("p"))
        .select(col("cnt"), col("p.l").as("l"), col("p.r").as("r"))
      // the argmax pair: exact counts, lexicographic tie-break — ONE
      // row to the driver per round (TakeOrdered, never a full sort)
      val best = pairs.groupBy("l", "r").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        table += ((round.toLong, l, r, l + r, c))
        syms = syms.select(col("word"), col("cnt"),
          replace(col("s"), lit(s"|$l||$r|"), lit(s"|$l$r|")).as("s"))
      }
      round += 1
    }
    // hand the caller a PINNED final table when it will be consumed
    // (bpeEncode's join) — and release the base once the final is
    // materialized; a vocab-only caller skips the final pin entirely
    // and owns the base's unpin
    if (materializeSyms && !(syms eq base)) {
      val fin = pin(syms)
      graft.Staging.unpin(base)
      (table.toSeq, fin)
    } else (table.toSeq, base) // vocab-only callers unpin the base
  }
}
