package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for a training-data pipeline, each designed as
  * a shuffle-minimal distributed plan:
  *
  *  - exact: one hash-shuffle on the fingerprint (the minimum possible);
  *  - MinHash+LSH: signatures are map-side only; the band→bucket join
  *    shuffles on (band, bucket) — candidates, never the full cross
  *    product. This is the standard shingle→minhash→band pipeline
  *    (Broder; Leskovec et al., Mining of Massive Datasets ch.3);
  *  - SimHash: 64-bit signature map-side; candidates via banded prefix
  *    buckets, verified by hamming distance;
  *  - n-gram Jaccard: blocked self-join (equality keys) + exact
  *    array_intersect/array_union verify — no O(n²) pairs at scale.
  *
  * All hashing uses xxhash64 (codegen'd, engine-native) — candidate
  * generation is therefore not DuckDB-reproducible; correctness of those
  * stages is covered by planted-duplicate unit tests, while exact-verify
  * stages (Jaccard) remain oracle-checkable.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per normalized-text fingerprint.
    * Aggregation form (min over groups), not window form — cheaper: the
    * shuffle carries partial minima, not full rows.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup, survivor rows: the deduplicated corpus itself. */
  def exactSurvivors(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col("text")))
      .orderBy(col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  // ---------------------------------------------------------------- MinHash

  /** Word k-shingles of a document (arrays of k consecutive tokens joined
    * by a space), as a distinct array column.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: numPerm permuted min-hashes over the shingle set.
    * Each permutation is xxhash64(shingle, seed=i) minimized across the
    * set — a pure column expression, map-side only, codegen'd.
    */
  def minhashSignature(shingleCol: Column, numPerm: Int = 64): Column =
    array((0 until numPerm).map { i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band to a bucket. Docs sharing any (band, bucket) are
    * candidate pairs. bands=16 × rows=4 over 64 perms targets J≈0.7+.
    */
  def lshBuckets(docsWithSig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    docsWithSig.select(
      col("doc_id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → band join →
    * exact-Jaccard verify on the candidate pairs only. Returns verified
    * pairs (doc_id_a < doc_id_b) with their exact shingle Jaccard.
    *
    * Scale: the only shuffles are (band,bucket) for candidates and the
    * final distinct on pairs; signatures never leave their partitions
    * until a bucket collides.
    */
  def minhashNearDups(
      docs: DataFrame,
      k: Int = 2,
      numPerm: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val withSig = docs
      .select(col("doc_id"), shingles(col("text"), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numPerm))
    val rowsPerBand = numPerm / bands
    val buckets = lshBuckets(withSig.select("doc_id", "sig"), bands, rowsPerBand)
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_id_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").distinct()
    val sh = withSig.select(col("doc_id"), col("sh"))
    candidates
      .join(sh.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("sh", "sh_a"), "doc_id_a")
      .join(sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sh", "sh_b"), "doc_id_b")
      .withColumn("jaccard",
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).cast("decimal(18,6)"))
      .filter(col("jaccard") >= threshold)
      .select("doc_id_a", "doc_id_b", "jaccard")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over tokens: sum per-bit votes of each token's
    * xxhash64, take the sign. Expressed as 64 aggregate bit-votes in one
    * projection — map-side only.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << bit)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup: candidates share one of four 16-bit bands (any pair
    * within hamming ≤ 3 must agree on ≥1 band — pigeonhole), verified by
    * full hamming distance.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------------- Jaccard

  /** Blocked n-gram Jaccard: candidate pairs share at least one of two
    * staggered length buckets (width 64, offset 32 — any two docs within
    * 32 chars of each other are guaranteed to share a bucket); each
    * candidate is verified with exact bigram-shingle Jaccard. Equality
    * blocking keys keep the join shuffled-hash at any scale, and the
    * whole thing is SQL-expressible → oracle-checked.
    */
  def blockedJaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val sh = docs.select(col("doc_id"), col("n_chars"),
      shingles(col("text"), 2).as("sh"))
    val bucketed = sh.select(col("doc_id"),
      explode(array_distinct(array(
        expr("n_chars div 64"), expr("(n_chars + 32) div 64")))).as("bucket"))
    val a = bucketed.select(col("bucket"), col("doc_id").as("doc_id_a"))
    val b = bucketed.select(col("bucket"), col("doc_id").as("doc_id_b"))
    val candidates = a.join(b, Seq("bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").distinct()
    candidates
      .join(sh.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), "doc_id_a")
      .join(sh.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), "doc_id_b")
      .withColumn("jaccard",
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).cast("decimal(18,6)"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
  }
}
