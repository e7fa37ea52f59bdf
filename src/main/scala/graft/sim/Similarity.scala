package graft.sim

import scala.util.chaining._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecText

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Three tiers, by scale:
  *  1. brute-force cosine top-k — the exact baseline. Query set broadcast
  *     against the corpus (never corpus×corpus); one scan, one small
  *     top-k shuffle. Exact, and the recall oracle for the ANN tiers.
  *  2. random-hyperplane LSH (SimHash for vectors, Charikar'02): each
  *     vector gets a b-bit sign signature from deterministic pseudo-random
  *     hyperplanes; candidates share a signature bucket. Map-side
  *     signatures + one (bucket) shuffle — the 100 TB path.
  *  3. IVF coarse quantization with a TRAINED quantizer: Lloyd's k-means
  *     (fixed iterations, decimal-sum centroids so every round is exact
  *     and engine-replayable), inverted lists keyed by centroid, queries
  *     probe the `nprobe` nearest lists. Two seedings: per-label decimal
  *     sums when a label column exists ([[ivfTopK]]), and a label-free
  *     md5-ranked sample of the corpus itself ([[ivfTopKUnlabeled]]) for
  *     the unlabeled-pretraining-corpus case.
  *
  * All dot products run in double precision via `aggregate`/`zip_with`
  * column expressions — codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity between two array columns, computed in double via
    * higher-order functions. Generic (any numeric element type) but
    * interpreted per element — used only where sides have mixed types
    * (IVF centroids are double[]); hot paths use `VecText.fvec_dot` with
    * precomputed norms instead.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    // zero-norm guard: ANSI double /0 throws — a single all-zero vector
    // would kill the job; NULL matches DuckDB's /0 and sorts last under
    // desc on both engines
    when(na * nb > 0, dot / (na * nb))
  }

  /** L2 norm of a float-array column — computed once per row, so pairwise
    * cosines only pay the dot product.
    */
  def fnorm(emb: Column): Column = sqrt(VecText.fvec_dot(emb, emb))

  /** Pairwise cosine from embeddings + precomputed norms: one tight-loop
    * dot product per pair (VecText.FloatVecDot), no per-pair norm work.
    */
  def cosineWithNorms(aEmb: Column, bEmb: Column, aNorm: Column, bNorm: Column): Column =
    // zero-norm guard: see cosine()
    when(aNorm * bNorm > 0, VecText.fvec_dot(aEmb, bEmb) / (aNorm * bNorm))

  /** Brute-force exact top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` is expected to be small (it is
    * broadcast); the corpus is scanned once. Deterministic tie-break on
    * vec_id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      fnorm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      fnorm(col("embedding")).as("c_norm"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        // decimal(18,6) normalizes cross-engine float noise; final double
        // keeps pyarrow/DuckDB hash representations identical
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors with a DIFFERENT label —
    * the pairs that teach a contrastive model the most. Same plan shape
    * as [[bruteForceTopK]] (broadcast queries × one corpus scan, window
    * top-k); the label inequality rides in the join condition, so
    * same-label pairs never materialize.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("label").as("query_label"),
      col("embedding").as("q_emb"), fnorm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
      col("embedding").as("c_emb"), fnorm(col("embedding")).as("c_norm"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val scored = c.join(broadcast(q), col("query_label") =!= col("neighbor_label"))
      .withColumn("cos",
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("query_label"), col("rnk"),
        col("neighbor_id"), col("neighbor_label"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a hash-derived value in [-0.5, 0.5). Seeds the LSH signatures without
    * any RNG state — reproducible across executors by construction.
    * HOF reference formulation, kept as the property-test anchor for the
    * fast expression below.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    ((conv(substring(md5(concat_ws("-", lit("rhp"), lit(plane), dim)), 1, 15), 16, 10)
      .cast("long") % 1000000L).cast("double") / 1000000.0) - 0.5

  /** HOF formulation of the signature (slow; see rhpSignature). */
  def rhpSignatureHof(emb: Column, bits: Int = 16): Column =
    (0 until bits).map { p =>
      val dotp = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dotp > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** b-bit random-hyperplane signature of an embedding — single-pass
    * custom expression (VecText.RhpSignature), value-identical to
    * rhpSignatureHof (asserted in VecTextSpec).
    */
  def rhpSignature(emb: Column, bits: Int = 16): Column =
    VecText.rhp_signature(emb, bits)

  /** Band i of a banded signature: bits [i·bandBits, (i+1)·bandBits). */
  private def bandSlice(sig: Column, i: Int, bandBits: Int): Column = {
    val mask = if (bandBits == 64) lit(-1L) else lit((1L << bandBits) - 1)
    shiftrightunsigned(sig, i * bandBits).bitwiseAND(mask)
  }

  /** Smallest band index where two signatures collide — the emit-once
    * key of every banded candidate join (a pair sharing several bands is
    * kept only where `band === minSharedBand`, both signatures being in
    * the joined row, so no DISTINCT shuffle is ever needed).
    */
  private def minSharedBand(sigA: Column, sigB: Column, nBands: Int,
      bandBits: Int): Column =
    array_min(array((0 until nBands).map(i =>
      when(bandSlice(sigA, i, bandBits) === bandSlice(sigB, i, bandBits),
        lit(i))): _*))

  /** LSH-bucketed ANN: queries and corpus are bucketed by multi-probe
    * banded signatures (4 bands of bits/4 each); candidates share any
    * band bucket; exact cosine re-ranks within candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, bits: Int = 16): DataFrame = {
    // 4 bands must tile the signature exactly — a non-multiple would
    // silently leave the high bits computed but never bucketed
    require(bits <= 64 && bits % 4 == 0, "bits must be ≤64 and a multiple of 4")
    val bandBits = bits / 4
    def banded(df: DataFrame, idName: String, embName: String, normName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
          fnorm(col("embedding")).as(normName),
          rhpSignature(col("embedding"), bits).as("sig"))
        .select(col(idName), col(embName), col(normName),
          posexplode(array((0 until 4).map(b =>
            bandSlice(col("sig"), b, bandBits)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val qb = banded(queries, "query_id", "q_emb", "q_norm")
    val cb = banded(corpus, "neighbor_id", "c_emb", "c_norm")
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val cands = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_emb", "q_norm", "neighbor_id", "c_emb", "c_norm")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("cos",
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** Per-dimension DECIMAL SUM centroid of each group's vectors, not the
    * float mean: cosine is scale-invariant (sum ∝ mean), and a decimal
    * sum is exact — assignment stops depending on float merge order, so
    * the whole operator is deterministic and oracle-checkable. The cast
    * goes float→string→decimal: both engines parse the float's shortest
    * decimal representation (a direct float→decimal cast diverges —
    * Spark expands via double, DuckDB via shortest repr). The groupBy
    * sums combine map-side (partial agg), so each Lloyd round shuffles
    * only K×dims partial sums, not vectors.
    */
  private def decimalSumCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("centroid_id"), posexplode(col("embedding")))
      .groupBy("centroid_id", "pos")
      .agg(sum(col("col").cast("string").cast("decimal(18,9)")).as("vsum"))
      .groupBy("centroid_id").agg(array_sort(
        collect_list(struct(col("pos"), col("vsum").cast("double").as("v")))).as("pv"))
      .select(col("centroid_id"), transform(col("pv"), p => p.getField("v")).as("centroid"))

  /** Per-dimension decimal MEAN centroid — the magnitude-faithful
    * variant [[pqTopK]]'s codebooks need: ADC reconstruction
    * CONCATENATES sub-centroids, so a sum-centroid would scale each
    * subspace by its cluster size and corrupt the cross-subspace dot
    * (cosine-probed IVF never notices — per-centroid scale cancels
    * there). The decimal sum divides by the exact member count in
    * double, so the mean is as deterministic as the sum.
    */
  private def decimalMeanCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("centroid_id"), posexplode(col("embedding")))
      .groupBy("centroid_id", "pos")
      .agg((sum(col("col").cast("string").cast("decimal(18,9)")).cast("double")
        / count(lit(1))).as("v"))
      .groupBy("centroid_id").agg(array_sort(
        collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("centroid_id"), transform(col("pv"), p => p.getField("v")).as("centroid"))

  /** Nearest-centroid assignment by cosine (ties → lowest centroid_id),
    * with ZERO shuffle of the corpus: the K centroids collapse to one
    * sorted array on a single-row broadcast table, and the argmax runs
    * per row as one codegen'd tight loop (VecText.nearest_centroid). A
    * window/groupBy formulation would shuffle n (or n×K) rows per Lloyd
    * round — at deployment scale (K in the thousands of inverted lists)
    * that inverts the canonical distributed k-means cost model, where
    * assignment is map-side and only the K×dims partial sums ever cross
    * the wire. Tie/NULL parity with the oracle's
    * `ORDER BY d DESC, centroid_id` window is documented on the kernel
    * (VecTextKernels.nearestCentroid).
    */
  private[graft] def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = centroids.agg(array_sort(
      collect_list(struct(col("centroid_id"), col("centroid")))).as("cents"))
    vectors.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("embedding"),
        VecText.nearest_centroid(col("cents"), col("embedding")).as("centroid_id"))
  }

  /** IVF ANN with a TRAINED coarse quantizer: Lloyd's k-means
    * (`lloydIters` fixed iterations — fixed so any engine can replay the
    * training verbatim), inverted lists keyed by centroid id, queries
    * probe the `nprobe` nearest centroids, exact re-rank inside probed
    * lists.
    *
    * Training is fully deterministic: initial centroids are the
    * per-label decimal sums (a data-derived seeding — k-means++ without
    * RNG), and each Lloyd round recomputes centroids as exact decimal
    * sums of the reassigned vectors ([[decimalSumCentroids]]), so every
    * round — and therefore the final lists and query results — is
    * bit-reproducible cross-engine (the DuckDB oracle unrolls the same
    * rounds as CTE stages). A centroid that loses all vectors simply
    * drops out of the next round (standard empty-cluster handling).
    *
    * Scale: each round is one broadcast-join scan of the corpus plus a
    * K×dims partial-sum shuffle — the canonical distributed k-means
    * shape; the corpus never shuffles during training. The final lists
    * ARE the shuffle a real deployment would persist (stored
    * pre-partitioned by list → shuffle-free at query time).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, nprobe: Int = 2,
      lloydIters: Int = 2): DataFrame =
    ivfFromSeed(corpus, queries,
      corpus.select(col("label").as("centroid_id"), col("embedding")),
      k, nprobe, lloydIters)

  /** Label-free IVF ANN: identical trained quantizer and probe plan as
    * [[ivfTopK]], but the initial centroids are `kCentroids` corpus
    * vectors picked by md5 rank of the vec_id — a deterministic,
    * RNG-free sample an unlabeled pretraining corpus can always provide
    * (the case the label-seeded variant cannot serve). Selection is
    * `ORDER BY md5('ivfseed-' || vec_id) LIMIT K`: lexicographic hex
    * ordering is engine-identical, and Spark plans the global top-K as
    * TakeOrderedAndProject — a bounded per-partition heap merge, never a
    * full sort, so seeding costs one corpus scan at any scale. Each seed
    * becomes its own one-vector "group" through the same
    * [[decimalSumCentroids]] so initial centroids take the identical
    * float→decimal→double route as every later round.
    */
  def ivfTopKUnlabeled(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 2, lloydIters: Int = 2, kCentroids: Int = 8): DataFrame =
    ivfFromSeed(corpus, queries, ivfSeeds(corpus, kCentroids), k, nprobe, lloydIters)

  /** The label-free seed stage of [[ivfTopKUnlabeled]], exposed so the
    * plan-regression spec can assert it compiles to
    * TakeOrderedAndProject (the seeding runs as its own checkpointed
    * job, outside the final query's lineage).
    */
  private[graft] def ivfSeeds(corpus: DataFrame, kCentroids: Int): DataFrame =
    corpus
      .select(col("vec_id").as("centroid_id"), col("embedding"),
        md5(concat(lit("ivfseed-"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("centroid_id"))
      .limit(kCentroids)
      .select("centroid_id", "embedding")

  /** Lloyd's k-means from deterministic seed groups: the shared trainer
    * behind the IVF tiers and [[semDedup]]. Returns the pinned K-row
    * trained centroid table (centroid_id, centroid: array<double>).
    *
    * k-means is inherently iterative: each round's K-row centroid table
    * materializes eagerly (localCheckpoint, tiny) so (a) round r+1's
    * plan doesn't nest round r's whole lineage — Catalyst time grows
    * linearly, not geometrically — and (b) a trained table with several
    * consumers (inverted lists + query probes) doesn't re-run training.
    */
  private def trainCentroids(corpus: DataFrame, seedGroups: DataFrame,
      lloydIters: Int): DataFrame = {
    def pin(df: DataFrame): DataFrame = graft.Staging.pin(df)
    val init = pin(decimalSumCentroids(seedGroups))
    (1 to lloydIters).foldLeft(init) { (cents, _) =>
      val next = pin(decimalSumCentroids(
        assignToCentroids(corpus.select("vec_id", "embedding"), cents)
          .select(col("centroid_id"), col("embedding"))))
      graft.Staging.unpin(cents)
      next
    }
  }

  /** The standalone trained coarse quantizer — `(centroid_id, centroid)`,
    * pinned — for callers that maintain an IVF index across time rather
    * than answer one query: train ONCE on the base corpus, freeze, hand
    * to [[StreamingSimilarity.maintainIvfLists]] for continuous
    * ingestion, retrain when its drift/mass trigger fires. Same
    * deterministic label-free training as [[ivfTopKUnlabeled]].
    */
  def trainQuantizer(corpus: DataFrame, kCentroids: Int = 8,
      lloydIters: Int = 2): DataFrame =
    trainCentroids(corpus.select("vec_id", "embedding"),
      ivfSeeds(corpus, kCentroids), lloydIters)

  /** Shared IVF core: train from `seedGroups` (rows of (centroid_id,
    * embedding) — a label partition or single seed vectors), build
    * inverted lists, probe, exact re-rank. See [[ivfTopK]] Scaladoc for
    * the determinism and scale contract.
    */
  private def ivfFromSeed(corpus: DataFrame, queries: DataFrame, seedGroups: DataFrame,
      k: Int, nprobe: Int, lloydIters: Int): DataFrame = {
    val trained = trainCentroids(corpus, seedGroups, lloydIters)
    ivfServe(assignToCentroids(corpus.select("vec_id", "embedding"), trained),
      trained, queries, k, nprobe)
  }

  /** Serve top-k from an ALREADY-BUILT IVF index: `assigned` is the
    * inverted-list table ((vec_id, embedding, centroid_id) — what
    * [[assignToCentroids]] emits and what a continuously-maintained
    * index stores, partitionable by centroid_id at deployment), `cents`
    * the quantizer it was assigned under. The query path of every
    * ivfTopK* variant, split from training so an index owner (e.g.
    * [[StreamingSimilarity.IvfIndexMaintainer]]) pays training only at
    * swap time, not per query. Probes broadcast against the list table;
    * the corpus never shuffles.
    */
  def ivfServe(assigned: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val lists = assigned
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("d").desc, col("centroid_id"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("d", cosine(col("q_emb"), col("centroid")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("query_id", "q_emb", "centroid_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** Label-free embedding near-duplicate pairs via random-hyperplane LSH
    * — the non-quadratic path for unlabeled corpora (the common
    * pretraining case, where [[embeddingNearDups]]'s label blocking
    * isn't available and its within-block O(block²) wouldn't survive a
    * hot block anyway).
    *
    * Plan: signature map-side (one [[rhpSignature]] pass per vector) →
    * band the `bits`-bit signature into `bits/bandBits` bands → one
    * (band, bucket) shuffle joins colliding vectors — each pair emitted
    * exactly once, at the SMALLEST band both share (computable from the
    * two signatures riding the join, so no DISTINCT shuffle) → exact
    * cosine verify on candidates only.
    *
    * Tuning (Charikar'02 sign-LSH): a pair at angle θ agrees on one bit
    * w.p. p = 1-θ/π; on a band w.p. p^bandBits; recall over b bands is
    * 1-(1-p^bandBits)^b. Background (near-orthogonal) pairs collide
    * w.p. ~2^-bandBits per band, so expected random candidates are
    * ~b·n²/2^bandBits: size bandBits toward log2(n) at deployment scale
    * and spend signature bits on more bands for recall — the classic
    * n^(1+ρ) LSH work curve, ρ = ln(1/p₁)/ln(1/p₂). The defaults
    * (64 bits, 8 bands of 8) suit true near-dups (cos ≳ 0.85, recall
    * ≥ ~0.95); at permissive thresholds on isotropic data no
    * sub-quadratic candidate scheme separates the tail — that regime
    * belongs to the exact operator.
    */
  def embeddingNearDupsLsh(
      embeddings: DataFrame,
      threshold: Double = 0.3,
      bits: Int = 64,
      bandBits: Int = 8): DataFrame = {
    require(bits <= 64 && bits % bandBits == 0, "bits must be ≤64, a multiple of bandBits")
    val nBands = bits / bandBits
    // spread the pre-fan-out side: a single-file corpus would otherwise
    // put the whole band explode + candidate join on one task
    val para = embeddings.sparkSession.sparkContext.defaultParallelism
    val sigs = embeddings
      .select(col("vec_id"), rhpSignature(col("embedding"), bits).as("sig"))
      .repartition(para)
    val banded = sigs.select(col("vec_id"), col("sig"),
      posexplode(array((0 until nBands).map(bandSlice(col("sig"), _, bandBits)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("vec_id").as("vec_id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("vec_id").as("vec_id_b"), col("sig").as("sig_b"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("vec_id_a") < col("vec_id_b")
        && col("band") === minSharedBand(col("sig_a"), col("sig_b"), nBands, bandBits))
      .select("vec_id_a", "vec_id_b")
    verifyNearDupCandidates(cands, embeddings, threshold)
  }

  /** Exact-cosine verify of candidate id pairs against an embedding
    * table: the final stage of [[embeddingNearDupsLsh]], shared with the
    * streaming candidate generator
    * ([[StreamingSimilarity.nearDupCandidates]]) so batch and
    * incremental paths score pairs identically. Candidates are sparse →
    * join embeddings back by id (two hash joins; Spark broadcasts the
    * small side automatically at test scale).
    */
  def verifyNearDupCandidates(
      cands: DataFrame,
      embeddings: DataFrame,
      threshold: Double = 0.3): DataFrame = {
    val embN = embeddings.select(col("vec_id"), col("embedding"),
      fnorm(col("embedding")).as("nrm"))
    cands
      .join(embN.select(col("vec_id").as("vec_id_a"),
        col("embedding").as("emb_a"), col("nrm").as("norm_a")), "vec_id_a")
      .join(embN.select(col("vec_id").as("vec_id_b"),
        col("embedding").as("emb_b"), col("nrm").as("norm_b")), "vec_id_b")
      .withColumn("cos",
        cosineWithNorms(col("emb_a"), col("emb_b"), col("norm_a"), col("norm_b")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** Canonical near-dup clusters over the label-free LSH pairs: one
    * `(vec_id, cluster_id)` row per corpus vector, cluster_id = the
    * smallest vec_id reachable through verified near-dup pairs
    * (singletons label themselves). Composition of
    * [[embeddingNearDupsLsh]] with the endpoints-only connected
    * components from the text tier — per-round cost O(|pairs|), the
    * corpus joins back once at the end.
    */
  def embeddingClusters(embeddings: DataFrame, threshold: Double = 0.3,
      bits: Int = 64, bandBits: Int = 8): DataFrame =
    graft.dedup.Dedup.connectedComponents(
      embeddings.select(col("vec_id").as("doc_id")),
      embeddingNearDupsLsh(embeddings, threshold, bits, bandBits)
        .select(col("vec_id_a").as("doc_id_a"), col("vec_id_b").as("doc_id_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  /** The embedding-level deduplicated corpus: one survivor per
    * [[embeddingClusters]] cluster (its min vec_id), with the vector's
    * metadata joined back.
    */
  def embeddingDedupSurvivors(embeddings: DataFrame, threshold: Double = 0.3,
      bits: Int = 64, bandBits: Int = 8): DataFrame =
    embeddings.join(
      embeddingClusters(embeddings, threshold, bits, bandBits)
        .filter(col("vec_id") === col("cluster_id"))
        .select("vec_id"),
      "vec_id")

  /** Embedding-level benchmark decontamination: flag corpus vectors
    * whose cosine to ANY benchmark vector reaches `threshold` — the
    * semantic twin of the n-gram [[graft.dedup.Dedup.decontaminate]]
    * (paraphrased eval data survives n-gram screens; its embedding
    * doesn't move nearly as much).
    *
    * Scale shape mirrors the text version exactly: the benchmark side is
    * tiny next to the corpus, so its banded RHP signatures build once
    * and BROADCAST; the corpus computes signatures map-side and probes
    * the broadcast bucket index with NO corpus shuffle at all. Candidate
    * (corpus, bench) collisions dedupe via the min-shared-band rule
    * (both signatures ride the joined row), exact cosine verifies, and
    * the only shuffle is the per-corpus-vector hit aggregation —
    * verified hits only, a vanishing fraction.
    */
  def embeddingDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      threshold: Double = 0.3,
      bits: Int = 64,
      bandBits: Int = 8): DataFrame = {
    require(bits <= 64 && bits % bandBits == 0, "bits must be ≤64, a multiple of bandBits")
    val nBands = bits / bandBits
    def banded(df: DataFrame, idName: String, sigName: String): DataFrame =
      df.select(col("vec_id").as(idName),
          rhpSignature(col("embedding"), bits).as(sigName))
        .select(col(idName), col(sigName),
          posexplode(array((0 until nBands).map(bandSlice(col(sigName), _, bandBits)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val para = corpus.sparkSession.sparkContext.defaultParallelism
    val benchBanded = banded(benchmark, "bench_id", "sig_b")
    val corpusBanded = banded(corpus.repartition(para), "vec_id", "sig_a")
    val cands = corpusBanded.join(broadcast(benchBanded), Seq("band", "bucket"))
      .filter(col("band") === minSharedBand(col("sig_a"), col("sig_b"), nBands, bandBits))
      .select("vec_id", "bench_id")
    val embN = (df: DataFrame, id: String, e: String, n: String) =>
      df.select(col("vec_id").as(id), col("embedding").as(e),
        fnorm(col("embedding")).as(n))
    cands
      .join(embN(corpus, "vec_id", "emb_a", "norm_a"), "vec_id")
      .join(embN(benchmark, "bench_id", "emb_b", "norm_b"), "bench_id")
      .withColumn("cos",
        cosineWithNorms(col("emb_a"), col("emb_b"), col("norm_a"), col("norm_b")))
      .filter(col("cos") >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_benchmark_hits"),
        max(col("cos").cast("decimal(18,6)")).cast("double").as("max_cosine"))
  }

  /** Embedding near-duplicate pairs: same-label blocking + exact cosine ≥
    * threshold. SQL-expressible (unnest join) → oracle-checked.
    */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double = 0.3): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("vec_id_a"),
      col("embedding").as("emb_a"), fnorm(col("embedding")).as("norm_a"))
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
    val b = embeddings.select(col("label"), col("vec_id").as("vec_id_b"),
      col("embedding").as("emb_b"), fnorm(col("embedding")).as("norm_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos",
        cosineWithNorms(col("emb_a"), col("emb_b"), col("norm_a"), col("norm_b")))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("vec_id_a"), col("vec_id_b"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }

  /** SemDeDup (Abbas et al. '23, arXiv:2303.09540): semantic dedup that
    * makes the all-pairs cosine tractable by first clustering with
    * k-means and only comparing WITHIN a cluster. Returns the surviving
    * corpus — one `(vec_id, cluster_id)` row per kept vector; a vector
    * is pruned when an earlier (smaller vec_id) vector in the same
    * trained cluster sits within `threshold` cosine.
    *
    * Training reuses the label-free quantizer verbatim ([[ivfSeeds]] →
    * [[trainCentroids]]): md5-ranked seed sample, fixed Lloyd rounds,
    * decimal-sum centroids — so the whole operator, pruning included,
    * is deterministic and oracle-replayable.
    *
    * Scale: this is THE trick that takes semantic dedup to 100 TB —
    * global all-pairs is O(n²); with K clusters the pair stage is
    * O(Σᵢ cᵢ²), so growing K with n (paper: K ≈ n/⟨cluster⟩, keeping
    * cluster size roughly constant) keeps total work near-linear.
    * Plan: training never shuffles the corpus (broadcast-argmax rounds,
    * K×dims partial sums), then ONE shuffle partitions vectors by
    * cluster_id and the pair join + anti-join run cluster-local. A
    * pathological hot cluster (mass-duplicated boilerplate collapsing
    * into one centroid) would re-introduce one quadratic TASK — so
    * clusters above `blockRows` rows take the triangle sub-block path:
    * rows get a deterministic salt in [0, m) (m = ⌈size/blockRows⌉) and
    * the pair stage joins on (cluster, blockᵢ, blockⱼ) with the left
    * side fanned to blocks ≥ its salt and the right side to blocks ≤ its
    * salt — every unordered pair meets in exactly one of the m(m+1)/2
    * block tasks, each bounded at ~blockRows² comparisons. Total work is
    * unchanged (all-pairs-within-cluster IS the operator); what the
    * sub-blocking buys is that no single straggler task is quadratic in
    * the hot cluster — the classic salted-skew-join construction applied
    * to a self-join triangle. Normal-sized clusters never pay the
    * (m+1)-fold fan-out: they keep the zero-exchange single-key join on
    * the pinned cluster partitioning (SemDedupSkewSpec pins equality of
    * the two paths; the plan guard keeps both hash-join-shaped).
    *
    * `blockRows` default 4096 bounds a task at ~4096² ≈ 16.7M pair
    * cosines (~10 s at 64 dims) — the configuration the skew probe
    * measured (planted 30k-copy hot cluster: 327 s as one task → 86 s
    * sub-blocked, 36 tasks saturating local[32]). A larger bound (the
    * old 65536 default allowed ~4.3e9 pairs/task) leaves the guard
    * inert for exactly the straggler sizes it exists to break up.
    */
  def semDedup(embeddings: DataFrame, threshold: Double = 0.3,
      kCentroids: Int = 8, lloydIters: Int = 2,
      blockRows: Int = 4096): DataFrame = {
    val trained = trainCentroids(embeddings, ivfSeeds(embeddings, kCentroids), lloydIters)
    // stage the assignment ONCE: the pair sides and the survivors
    // anti-join are three consumers, and neither Catalyst's ReuseExchange
    // nor AQE collapsed their branch-specific projections — without the
    // pin the corpus argmax scan ran three times (plan-guard-asserted
    // now). Staged via the Staging seam: localCheckpoint single-JVM,
    // -Dgraft.staging=persist|reliable where executor loss must be
    // recoverable — output is strategy-independent (StagingStrategySpec).
    // Pin lifetime follows the returned LAZY frame (the survivors
    // anti-join reads it), so the blocks are ContextCleaner-reclaimed
    // when the caller drops the result — an eager unpin here would free
    // what the un-materialized result still needs, and an eager result
    // pin would collapse the plan the plan guards assert on.
    val assigned = assignToCentroids(embeddings.select("vec_id", "embedding"), trained)
      .withColumn("nrm", fnorm(col("embedding")))
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism, col("centroid_id"))
      .pipe(graft.Staging.pin)
    // K-row cluster-size table decides per cluster which path its rows
    // take; broadcast back onto the pinned assignment (stream side keeps
    // its partitioning, so the small path below still joins exchange-free)
    val sizes = assigned.groupBy("centroid_id").agg(count(lit(1)).as("c_n"))
    val tagged = assigned.join(broadcast(sizes), Seq("centroid_id"))
      .withColumn("n_blk",
        greatest(lit(1L), ceil(col("c_n").cast("double") / blockRows)).cast("int"))
    val small = tagged.filter(col("n_blk") === 1)
    val hot = tagged.filter(col("n_blk") > 1)
      .withColumn("blk", pmod(xxhash64(col("vec_id")), col("n_blk")).cast("int"))

    val a = small.select(col("centroid_id"), col("vec_id").as("vec_id_a"),
      col("embedding").as("emb_a"), col("nrm").as("norm_a"))
    val b = small.select(col("centroid_id"), col("vec_id").as("vec_id_b"),
      col("embedding").as("emb_b"), col("nrm").as("norm_b"))
    val dominatedSmall = a.join(b, Seq("centroid_id"))
      .filter(col("vec_id_a") < col("vec_id_b"))
      .filter(cosineWithNorms(col("emb_a"), col("emb_b"),
        col("norm_a"), col("norm_b")) >= threshold)
      .select(col("vec_id_b").as("dom_id"))

    // triangle fan-out: left row (salt s) covers block pairs (s, s..m-1),
    // right row (salt s) covers (0..s, s) — pair (x, y) meets exactly once,
    // at (min salt, max salt); same-salt pairs meet twice and the id
    // inequality below keeps one. shuffle_hash hint: the block join must
    // stay a hash join (sorting the fanned-out hot rows buys nothing)
    val left = hot.select(col("centroid_id"), col("blk").as("blk_a"),
      explode(sequence(col("blk"), col("n_blk") - 1)).as("blk_b"),
      col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"),
      col("nrm").as("norm_a"))
    val right = hot.select(col("centroid_id"),
      explode(sequence(lit(0), col("blk"))).as("blk_a"), col("blk").as("blk_b"),
      col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"),
      col("nrm").as("norm_b"))
    val dominatedHot = left.join(right.hint("shuffle_hash"),
        Seq("centroid_id", "blk_a", "blk_b"))
      .filter((col("blk_a") === col("blk_b") && col("vec_id_a") < col("vec_id_b"))
        || col("blk_a") =!= col("blk_b"))
      .filter(cosineWithNorms(col("emb_a"), col("emb_b"),
        col("norm_a"), col("norm_b")) >= threshold)
      // cross-block pairs meet with arbitrary id order; the dominated
      // member of any within-threshold pair is always the LATER id
      .select(greatest(col("vec_id_a"), col("vec_id_b")).as("dom_id"))

    // survivors derive from the SAME projection as the pair branches —
    // all three consumers then share one canonical exchange, so AQE's
    // exchange reuse runs the corpus argmax scan once, not three times
    // (an anti branch with its own pruned projection defeated reuse)
    val aAll = assigned.select(col("centroid_id"), col("vec_id").as("vec_id_a"))
    aAll.join(dominatedSmall.unionByName(dominatedHot),
        col("vec_id_a") === col("dom_id"), "left_anti")
      .select(col("vec_id_a").as("vec_id"), col("centroid_id").as("cluster_id"))
  }

  /** Cluster-balanced sampling: at most `perCluster` vectors from each
    * trained semantic cluster, chosen by deterministic md5 rank — the
    * diversity-preserving subsample (uniform sampling over-represents
    * dense regions of embedding space; per-cluster quotas keep the tail
    * topics). Same label-free trained quantizer as the IVF/SemDeDup
    * tiers; the per-cluster pick is a rank window Spark prunes map-side
    * (WindowGroupLimit), so the full corpus never sorts globally.
    */
  def clusterBalancedSample(embeddings: DataFrame, perCluster: Int = 32,
      kCentroids: Int = 8, lloydIters: Int = 2): DataFrame = {
    val trained = trainCentroids(embeddings.select("vec_id", "embedding"),
      ivfSeeds(embeddings, kCentroids), lloydIters)
    val assigned = assignToCentroids(embeddings.select("vec_id", "embedding"), trained)
    val w = Window.partitionBy("centroid_id")
      .orderBy(md5(concat(lit("cbs-"), col("vec_id").cast("string"))), col("vec_id"))
    assigned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCluster)
      .select(col("vec_id"), col("centroid_id").as("cluster_id"))
  }

  /** Product-quantized ANN (Jégou et al. '11, spherical variant): the
    * extreme-compression index tier. The vector splits into `numSub`
    * subspaces; each subspace gets its own `subK`-centroid codebook
    * (trained with the SAME md5-seeded decimal-sum Lloyd loop as the
    * IVF tier, per sub-vector), and a corpus vector is stored as just
    * `numSub` codes — log₂(subK) bits each, a 64-dim float vector
    * compressed to 4 bytes here. Queries score by asymmetric distance
    * computation (ADC): one dot product per (query, sub-centroid) up
    * front — numSub×subK values — then each corpus candidate costs
    * `numSub` table lookups instead of a `dims`-wide dot product.
    * Assignment uses cosine (spherical k-means), so the whole operator
    * reuses the IVF kernels and stays deterministic + oracle-replayable.
    *
    * Scale: codebooks train on sub-vectors with the canonical k-means
    * shape (corpus never shuffles; subK×subDim partial sums per round);
    * encoding is map-side against the broadcast codebooks; scoring is a
    * broadcast of the tiny query table (with its ADC tables precomputed)
    * against one scan of the CODES — the index a real deployment holds
    * in memory where the raw vectors never fit. Reconstruction norms
    * ride with the codes (computed once at encode time), so cosine
    * needs no corpus-side float math at query time.
    *
    * Determinism: every sum that shapes output is either sequential
    * (per-subspace dots) or an explicit left-to-right sum over the
    * `numSub` terms — no engine-divergent reduction anywhere.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      numSub: Int = 4, subK: Int = 16, lloydIters: Int = 2,
      dims: Int = 64, rerank: Int = 0): DataFrame =
    pqCore(corpus, queries, k, numSub, subK, lloydIters, dims, coarse = None,
      rerank = rerank)

  /** `rerank` contract (pqTopK / ivfPqTopK): 0 disables the refine
    * stage (pure ADC ranking); > 0 is a fixed FAISS-`RFlat`-style
    * window; < 0 sizes the window automatically as k × m̂ where m̂ is
    * the largest code-group multiplicity in the encoded corpus (capped
    * at 1024) — see the sizing note inside [[pqCore]].
    */
  val AutoRerank: Int = -1

  /** IVF-PQ: the composed billion-scale index (the FAISS `IVFx,PQy`
    * shape). A full-vector coarse quantizer (the IVF tier's trained
    * k-means, `coarseK` lists) prunes the search to the `nprobe` lists
    * nearest each query, and PQ codes score the survivors via ADC — so
    * query cost is (lists probed)/(total lists) of the corpus × numSub
    * table lookups, while the index stores only codes + one list id per
    * vector. At deployment the coded table is PARTITIONED BY list id,
    * so probing reads nprobe partitions and the rest of the corpus is
    * never touched; at test scale the same semantics run as a
    * broadcast-join filter. Training, encoding, probing and scoring all
    * reuse the proven IVF/PQ stages unchanged, so the oracle replays
    * the whole composition.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      numSub: Int = 4, subK: Int = 16, lloydIters: Int = 2,
      dims: Int = 64, coarseK: Int = 8, nprobe: Int = 2,
      rerank: Int = 0): DataFrame =
    pqCore(corpus, queries, k, numSub, subK, lloydIters, dims,
      coarse = Some((coarseK, nprobe)), rerank = rerank)

  private def pqCore(corpus: DataFrame, queries: DataFrame, k: Int,
      numSub: Int, subK: Int, lloydIters: Int, dims: Int,
      coarse: Option[(Int, Int)], rerank: Int = 0): DataFrame = {
    require(dims % numSub == 0, s"dims $dims must split evenly into $numSub subspaces")
    require(lloydIters >= 1, "PQ needs at least the mean-codebook round")
    val subDim = dims / numSub
    def sub(df: DataFrame, m: Int): DataFrame =
      df.select(col("vec_id"), slice(col("embedding"), m * subDim + 1, subDim).as("embedding"))
    def subSeed(seeds: DataFrame, m: Int): DataFrame =
      seeds.select(col("centroid_id"),
        slice(col("embedding"), m * subDim + 1, subDim).as("embedding"))
    val seeds = ivfSeeds(corpus, subK).pipe(graft.Staging.pin)
    // per-subspace codebooks, each a pinned subK-row table. The numSub
    // trainings are independent, and each is a chain of TINY jobs
    // (subK×subDim partial sums per round) whose wall-clock is job
    // overhead, not compute — so submit them concurrently; Spark's
    // scheduler interleaves the rounds across subspaces (measured ~2×
    // on the sf0.1 probe, and on a busy cluster the tiny stages just
    // slot into free executor capacity)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // the coarse quantizer (full-vector k-means) is independent of the
    // subspace codebooks — launch it FIRST so its tiny training jobs
    // interleave with theirs instead of running as a sequential tail
    // (the same concurrent-tiny-jobs rationale as the codebook Futures)
    val coarseFut = coarse.map { case (coarseK, _) =>
      Future {
        trainCentroids(corpus.select("vec_id", "embedding"),
          ivfSeeds(corpus, coarseK), lloydIters)
      }
    }
    val books =
      Await.result(
        Future.sequence((0 until numSub).toList.map(m => Future {
          val subM = sub(corpus, m)
          // lloydIters-1 sum-centroid rounds, then the final round emits
          // the MEAN of its clusters as the codebook (see
          // decimalMeanCentroids — a mean-vs-sum codebook has identical
          // directions, so assignment/codes are unchanged, but ADC
          // reconstruction needs the faithful magnitude). Total
          // reassignments = lloydIters, same as the IVF tier.
          val trainedSums = trainCentroids(subM, subSeed(seeds, m), lloydIters - 1)
          val book = decimalMeanCentroids(
            assignToCentroids(subM, trainedSums)
              .select(col("centroid_id"), col("embedding")))
            .pipe(graft.Staging.pin)
          graft.Staging.unpin(trainedSums)
          book
        })), Duration.Inf)
    // ONE broadcast row holding every codebook (sorted by centroid id),
    // pinned: it feeds BOTH the encode and the ADC-table broadcasts, and
    // without the pin each branch would re-run the numSub K-row aggs
    val pqArrs = books.zipWithIndex.map { case (b, m) =>
      b.agg(array_sort(collect_list(struct(col("centroid_id"), col("centroid"))))
        .as(s"cents_$m"))
    }.reduce(_.crossJoin(_)).pipe(graft.Staging.pin)
    val coarseTrained = coarseFut.map(Await.result(_, Duration.Inf))
    val bookArrs = coarseTrained.fold(pqArrs) { ct =>
      pqArrs.crossJoin(ct.agg(array_sort(
        collect_list(struct(col("centroid_id"), col("centroid")))).as("coarse_cents")))
        .pipe(graft.Staging.pin)
    }
    // bookArrs is pinned and self-contained — release every upstream
    // pinned table NOW so repeated invocations (bench reps, composed
    // pipelines) don't accumulate dead checkpoint blocks in the block
    // manager (the same leak class the CC loop unpersists eagerly)
    graft.Staging.unpin(seeds)
    books.foreach(graft.Staging.unpin(_))
    coarseTrained.foreach(graft.Staging.unpin(_))
    if (coarseTrained.isDefined) graft.Staging.unpin(pqArrs)
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y), lit(0.0), (acc, v) => acc + v)
    // encode: nprobe-free map-side argmax per subspace + the
    // reconstruction norm² (explicit left-to-right sum over subspaces)
    val codeCols = (0 until numSub).map(m =>
      VecText.nearest_centroid(col(s"cents_$m"),
        slice(col("embedding"), m * subDim + 1, subDim)).as(s"code_$m"))
    def chosen(m: Int): Column =
      element_at(filter(col(s"cents_$m"),
        p => p.getField("centroid_id") === col(s"code_$m")), 1).getField("centroid")
    val listCol = coarse.toSeq.map(_ =>
      VecText.nearest_centroid(col("coarse_cents"), col("embedding")).as("list_id"))
    val coded = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(bookArrs))
      .select(col("vec_id") +:
        (0 until numSub).map(m => col(s"cents_$m")) ++: codeCols ++: listCol: _*)
      .select((col("vec_id").as("neighbor_id") +:
        (0 until numSub).map(m => col(s"code_$m")) ++:
        coarse.toSeq.map(_ => col("list_id"))) :+
          (0 until numSub).map(m => dotD(chosen(m), chosen(m)))
            .reduceLeft(_ + _).as("recon_nsq"): _*)
    // ADC tables: per query and subspace, the dot against every
    // sub-centroid, keyed by centroid id
    val tabCols = (0 until numSub).map(m =>
      transform(col(s"cents_$m"), c => struct(c.getField("centroid_id").as("id"),
        dotD(slice(col("embedding"), m * subDim + 1, subDim),
          c.getField("centroid")).as("d"))).as(s"tab_$m"))
    val qTabs = queries.select(col("vec_id").as("query_id"), col("embedding"),
        fnorm(col("embedding")).as("q_norm"))
      .crossJoin(broadcast(bookArrs))
      .select(col("query_id") +: col("q_norm") +: tabCols: _*)
    def lookup(m: Int): Column =
      element_at(filter(col(s"tab_$m"),
        p => p.getField("id") === col(s"code_$m")), 1).getField("d")
    // with a coarse stage: each query probes its nprobe nearest lists,
    // and the probe set rides the broadcast next to the ADC tables —
    // the scoring join keys on list id, so only probed lists score
    val qSide = coarse.fold(qTabs) { case (_, nprobe) =>
      val wProbe = Window.partitionBy("query_id")
        .orderBy(col("d").desc, col("centroid_id"))
      val probes = queries.select(col("vec_id").as("query_id"), col("embedding"))
        .crossJoin(broadcast(bookArrs.select(col("coarse_cents"))))
        .select(col("query_id"), col("embedding"), explode(col("coarse_cents")).as("c"))
        .select(col("query_id"), col("c.centroid_id").as("centroid_id"),
          cosine(col("embedding"), col("c.centroid")).as("d"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= nprobe)
        .select(col("query_id"), col("centroid_id").as("list_id"))
      probes.join(qTabs, Seq("query_id"))
    }
    // auto-sized refine window (rerank < 0): the tie set ADC cannot
    // order is exactly the rows sharing one code tuple, so the window
    // must cover k × (the largest code-group multiplicity m̂) — the
    // sizing rule the 100× recall table measured (R=40 < k·m̂ recovers
    // only partially; R ≥ k·m̂ restores brute-force recall). m̂ comes
    // from ONE partial-aggregated count over the coded table (map
    // output is bounded by distinct code tuples per partition, not n);
    // group-by-codes beats an exact-dup-fingerprint estimate because
    // near-copies a fingerprint would miss STILL collapse to one code
    // tuple — code multiplicity is the quantity that breaks ADC. The
    // coded table is pinned in this mode so the estimate and the
    // scoring join share one encode scan. Capped at 1024: the refine
    // candidate set (queries × R) must stay broadcast-sized.
    val (codedEff, effRerank) =
      if (rerank >= 0) (coded, rerank)
      else {
        val codedP = graft.Staging.pin(coded)
        // max of an empty aggregate is one NULL row — fail with the real
        // reason (no corpus) rather than an NPE out of getLong
        val mRow = codedP
          .groupBy((0 until numSub).map(m => col(s"code_$m")): _*)
          .agg(count(lit(1)).as("n")).agg(max("n")).head()
        require(!mRow.isNullAt(0),
          "PQ auto-rerank: empty corpus — no code groups to size the refine window against")
        val mhat = mRow.getLong(0)
        // the 1024 cap keeps queries×R broadcast-sized, but can never
        // undercut k itself — the refine window must cover the answer
        // (k > 1024 inherently broadcasts queries×k either way)
        (codedP, math.min(math.max(k * mhat, k.toLong),
          math.max(1024L, k.toLong)).toInt)
      }
    val joined = coarse match {
      case Some(_) => codedEff.join(broadcast(qSide), Seq("list_id"))
        .filter(col("query_id") =!= col("neighbor_id"))
      case None => codedEff.join(broadcast(qSide), col("query_id") =!= col("neighbor_id"))
    }
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val adcRanked = joined
      .withColumn("cos",
        when(col("q_norm") * sqrt(col("recon_nsq")) > 0,
          (0 until numSub).map(lookup).reduceLeft(_ + _)
            / (col("q_norm") * sqrt(col("recon_nsq")))))
      .withColumn("rnk", row_number().over(w).cast("long"))
    val result = if (effRerank <= 0) {
      adcRanked.filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
    } else {
      // FAISS-style refine stage: ADC ranking PRUNES to the top-`rerank`
      // candidates; exact cosines re-rank those. Fixes PQ's resolution
      // limit — 4-byte codes cannot order near-identical neighbors (the
      // 100× probe measured recall@10 = 0.175 on a corpus whose true
      // top-k are mutual near-copies; re-ranking restores it) — at the
      // cost of `rerank` exact dot products per query. The candidate set
      // is tiny (queries × rerank) and BROADCASTS against the embedding
      // store scan: the corpus still never shuffles.
      require(effRerank >= k, s"rerank window $effRerank must cover k=$k")
      val cands = adcRanked.filter(col("rnk") <= effRerank)
        .select(col("query_id"), col("neighbor_id"))
      val qEmb = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), fnorm(col("embedding")).as("qn"))
      val wx = Window.partitionBy("query_id")
        .orderBy(col("cosx").desc, col("neighbor_id"))
      corpus
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
          fnorm(col("embedding")).as("cn"))
        .join(broadcast(cands.join(qEmb, Seq("query_id"))), Seq("neighbor_id"))
        .withColumn("cosx",
          cosineWithNorms(col("q_emb"), col("c_emb"), col("qn"), col("cn")))
        .withColumn("rnk", row_number().over(wx).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col("neighbor_id"),
          col("cosx").cast("decimal(18,6)").cast("double").as("cosine"))
    }
    // auto mode pinned the corpus-sized coded table; the final ranking is
    // queries×k rows, so pin THAT (tiny, GC-reclaimed) and release the
    // coded blocks AND the codebook pin before returning — repeated
    // AutoRerank calls must not accumulate checkpoint blocks until GC.
    // In the explicit-rerank path the result is LAZY and still references
    // the pinned bookArrs, so its lifetime follows the returned frame
    // (ContextCleaner reclaims on drop) — an unpin here would free blocks
    // the un-materialized result needs.
    if (rerank >= 0) result
    else {
      val out = graft.Staging.pin(result)
      graft.Staging.unpin(codedEff)
      graft.Staging.unpin(bookArrs) // == pqArrs when there is no coarse stage
      out
    }
  }

  /** Scalar-quantized (int8) ANN: the memory-footprint tier. Each
    * dimension maps to an unsigned-8-bit code against corpus-derived
    * per-dimension (min, scale) — a 4× shrink vs float32 (256× vs the
    * double math), which at 100 TB is the difference between an index
    * that fits executor memory and one that doesn't. Scoring is
    * asymmetric-style ADC on DEQUANTIZED values (min + code·scale), so
    * ranking error comes only from the quantization grid.
    *
    * Everything is deterministic and SQL-expressible: the stats pass is
    * an explode + per-dimension min/max (map-side partial agg — the
    * shuffle is partitions×dims rows, not n×dims), codes are
    * `round((v−min)/scale)` in double (half-up == half-away-from-zero
    * here since the operand is ≥0 — engine-identical), and the score is
    * the usual sequential-order double cosine over dequantized arrays.
    * Query vectors quantize against the same grid; ties break on
    * neighbor_id. Recall vs [[bruteForceTopK]] is asserted in
    * DedupSimSpec.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    // per-dimension quantization grid → one broadcast row of
    // struct(mn, sc) per dim, aligned by pos
    val qparams = corpus
      .select(posexplode(col("embedding")))
      .groupBy("pos")
      .agg(min(col("col").cast("double")).as("mn"), max(col("col").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"),
        struct(col("mn").as("mn"),
          // zero-width dim (constant value) → scale 0; codes collapse to 0
          when(col("mx") > col("mn"), (col("mx") - col("mn")) / 255.0)
            .otherwise(lit(0.0)).as("sc"))))).as("pp"))
      .select(transform(col("pp"), p => p.getField("col2")).as("qp"))
    def quantized(df: DataFrame, idName: String, deqName: String): DataFrame =
      df.crossJoin(broadcast(qparams))
        .select(col("vec_id").as(idName),
          // code = round((v-mn)/sc) ∈ [0,255]; dequantize in the same
          // expression so only the double math the oracle replays remains
          // clamp keeps the code an honest u8 even for query values
          // outside the corpus grid (round is half-away-from-zero on
          // both engines)
          zip_with(col("embedding"), col("qp"), (v, p) =>
            p.getField("mn") + when(p.getField("sc") > 0,
              least(lit(255.0), greatest(lit(0.0),
                round((v.cast("double") - p.getField("mn")) / p.getField("sc")))))
              .otherwise(lit(0.0)) * p.getField("sc")).as(deqName))
    val q = quantized(queries, "query_id", "q_deq")
    val c = quantized(corpus, "neighbor_id", "c_deq")
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_deq"), col("c_deq")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        col("cos").cast("decimal(18,6)").cast("double").as("cosine"))
  }
}
