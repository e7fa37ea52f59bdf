package graft.sim

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
  *  3. IVF-style coarse quantization: assign vectors to the nearest of K
  *     coarse centroids, probe `nprobe` nearest lists per query. Here the
  *     centroids are per-label decimal-sum vectors (a stand-in for
  *     k-means — the plumbing, partitioning and probe logic are the real
  *     thing, and the decimal sums make assignment deterministic).
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

  /** LSH-bucketed ANN: queries and corpus are bucketed by multi-probe
    * banded signatures (4 bands of bits/4 each); candidates share any
    * band bucket; exact cosine re-ranks within candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, bits: Int = 16): DataFrame = {
    val bandBits = bits / 4
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, idName: String, embName: String, normName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
          fnorm(col("embedding")).as(normName),
          rhpSignature(col("embedding"), bits).as("sig"))
        .select(col(idName), col(embName), col(normName),
          posexplode(array((0 until 4).map(b =>
            shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*)))
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

  /** IVF-style ANN: coarse centroids (here: per-label decimal-sum
    * vectors, ∝ the mean — k-means stand-in), inverted lists keyed by
    * centroid id, queries probe the `nprobe` nearest centroids, exact
    * re-rank inside probed lists.
    * The centroid table is tiny → broadcast; the corpus shuffles once to
    * its list (in a real deployment it is *stored* pre-partitioned by
    * list, making this shuffle-free at query time).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5, nprobe: Int = 2): DataFrame = {
    // Centroid = per-dimension DECIMAL SUM of the list's vectors, not the
    // float mean: cosine is scale-invariant (sum ∝ mean), and a decimal
    // sum is exact — assignment stops depending on float merge order, so
    // the whole operator is deterministic and oracle-checkable. The cast
    // goes float→string→decimal: both engines parse the float's shortest
    // decimal representation (a direct float→decimal cast diverges —
    // Spark expands via double, DuckDB via shortest repr).
    val centroids = corpus
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg(sum(col("col").cast("string").cast("decimal(18,9)")).as("vsum"))
      .groupBy("label").agg(array_sort(
        collect_list(struct(col("pos"), col("vsum").cast("double").as("v")))).as("pv"))
      .select(col("label").as("centroid_id"),
        transform(col("pv"), p => p.getField("v")).as("centroid"))
    val assignments = corpus.crossJoin(broadcast(centroids))
      .withColumn("d", cosine(col("embedding"), col("centroid")))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("d").desc, col("centroid_id"))
    val lists = assignments.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("d").desc, col("centroid_id"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
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
}
