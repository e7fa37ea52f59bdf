package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The container has no codec libraries, so the *decode* kernel is a
  * clearly-marked deterministic stub — but everything around it is the
  * real distributed design:
  *  - schema: `(asset_id, media_type, payload: binary, meta: struct)`;
  *  - partition-local batch processing via `mapPartitions` over a typed
  *    Dataset (the Scala analogue of `mapInPandas`: one iterator per
  *    partition, amortized per-batch setup, no per-row driver traffic);
  *  - frame sampling as `explode(sequence(...))` — a generator, so frames
  *    parallelize across the cluster instead of widening one row.
  *
  * At 100 TB: payloads dominate; every transform here is map-side only
  * and column-pruned (metadata-only queries never read `payload` thanks
  * to parquet column pruning).
  */
object Multimodal {

  /** Raw multimodal asset row. */
  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata produced by the (stubbed) decode kernel. */
  case class Decoded(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Manufacture a binary `payload` column corpus from the documents
    * table — a stand-in for real media blobs with the same plumbing
    * (binary type, size skew, opaque content).
    */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** STUB decode kernel — deterministic fake in place of a real codec
    * (libjpeg/ffmpeg absent in this environment). Real deployments swap
    * `decodeStub` for the codec call; the partitioning, batching and
    * schema contract around it do not change.
    */
  def decodeStub(a: Asset): Decoded = {
    val n = a.payload.length.toLong
    Decoded(
      asset_id = a.asset_id,
      media_type = a.media_type,
      n_bytes = n,
      width = (n % 640).toInt + 16,
      height = ((n * 7) % 480).toInt + 16,
      n_frames = if (a.media_type == "video") (n % 120).toInt + 1 else 1)
  }

  /** Partition-local decode: the `mapInPandas` analogue. One iterator per
    * partition — codec contexts initialize once per partition, rows stream
    * through without materializing the partition in memory.
    */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { iter =>
      // per-partition setup happens here (codec init in a real kernel)
      iter.map(decodeStub)
    }
  }

  /** Same decode expressed as pure column expressions — the preferred
    * fast path when the kernel is arithmetic (stays in whole-stage
    * codegen, and is DuckDB-expressible for the oracle).
    */
  def decodeExpr(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      (pmod(octet_length(col("payload")), lit(640)) + 16).cast("long").as("width"),
      (pmod(octet_length(col("payload")).cast("long") * 7, lit(480)) + 16).cast("long").as("height"),
      when(col("media_type") === "video",
        (pmod(octet_length(col("payload")), lit(120)) + 1))
        .otherwise(1).cast("long").as("n_frames"))

  /** Resize planning: target box fit preserving aspect ratio — the
    * arithmetic every image-resize kernel needs, as pure column
    * expressions (the pixel transform itself is the stubbed codec step;
    * the dimension math and plumbing are real and oracle-checked).
    */
  def resizePlan(decoded: DataFrame, targetW: Int = 224, targetH: Int = 224): DataFrame =
    decoded
      .withColumn("scale_num", least(lit(targetW) * col("height"), lit(targetH) * col("width")))
      .select(col("asset_id"), col("width"), col("height"),
        // floor arithmetic in integers: scale = min(tw/w, th/h)
        expr(s"scale_num div height").cast("long").as("out_w"),
        expr(s"scale_num div width").cast("long").as("out_h"))

  /** Frame sampling: every `step`-th frame index of each video — a
    * generator (`explode(sequence)`), so downstream per-frame work
    * parallelizes across the cluster.
    */
  def sampleFrames(decoded: DataFrame, step: Int = 10): DataFrame =
    decoded
      .filter(col("media_type") === "video")
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  /** Feature-extraction stub over sampled frames: deterministic per-frame
    * "embedding" seed (again: the kernel is fake, the distribution shape —
    * map-side expression over exploded frames — is real). The seed is
    * md5-derived so it is engine-reproducible (oracle-checked).
    */
  def frameFeatures(frames: DataFrame): DataFrame =
    frames.select(col("asset_id"), col("frame_idx"),
      conv(substring(md5(concat_ws("-", col("asset_id"), col("frame_idx"))), 1, 15), 16, 10)
        .cast("long").as("feature_seed"))

  // ------------------------------------------------- perceptual near-dup

  /** One 32-bit word of the 64-bit block-hash signature (blocks
    * `lo..lo+31`, MSB first) — the interpreted HOF REFERENCE formulation,
    * kept as the property-test anchor for the codegen kernel (the same
    * pattern as `Similarity.rhpSignatureHof`). 64 interpreted
    * substr+md5+conv chains per row cost ~10 s at sf0.1; the kernel does
    * one tight loop.
    */
  private def phashWordHof(s: Column, lo: Int): Column =
    aggregate(
      transform(sequence(lit(lo), lit(lo + 31)), i => {
        val len = length(s).cast("long")
        val iL = i.cast("long")
        // proportional block bounds via exact integer math: the double
        // division is by 64 (a power of two, exact) on products < 2^53
        val st = (iL * len / 64).cast("long")
        val en = ((iL + 1) * len / 64).cast("long")
        val blk = s.substr((st + 1).cast("int"), (en - st).cast("int"))
        conv(substring(md5(blk), 32, 1), 16, 10).cast("long") % 2
      }),
      lit(0L), (acc, b) => acc * 2 + b)

  /** HOF formulation of [[phashWords]] (slow; the parity anchor). */
  def phashWordsHof(payloadText: Column): Column =
    array(phashWordHof(payloadText, 0), phashWordHof(payloadText, 32))

  /** 64-bit perceptual signature of a payload, as two 32-bit words
    * `[w0, w1]` — the block-hash family of perceptual hashes (Blockhash,
    * Yang et al.): split the content into 64 proportional blocks, one
    * bit per block. A localized edit touches one block → ≤1 bit per
    * word, while unrelated payloads agree on ~32 bits by chance.
    *
    * The per-block reduction here is md5-parity over the RAW payload
    * bytes — the codec-free stand-in for "mean of the decoded pixel
    * block" (this container ships no image/audio decoders; a real
    * deployment swaps the block reduction for block-mean-of-pixels and
    * keeps everything else). md5-parity is deliberately
    * engine-reproducible, so the full pipeline is oracle-checkable.
    *
    * Single-pass codegen kernel (VecText.PhashWords); [[phashWordsHof]]
    * is the interpreted reference it is spec'd value-identical to.
    */
  def phashWords(payloadText: Column): Column =
    graft.functions.VecText.phash_words(payloadText)

  /** Perceptual near-duplicate pairs over multimodal payloads: signature
    * map-side, then Hamming-banded candidates exactly like the SimHash
    * text tier — 4×16-bit bands over the 64-bit signature, so any pair
    * within `maxHamming` ≤ 3 shares ≥1 band (pigeonhole: exhaustive),
    * verified by full Hamming distance.
    *
    * Payloads below `minBytes` are excluded: with fewer bytes than
    * blocks the signature is mostly empty/single-byte blocks — no
    * structure, so unrelated tiny payloads sit at low Hamming and form
    * quadratic cliques (measured: the 100× ScaleProbe corpus produced
    * 3.76M degenerate pairs before the guard). The pHash family's
    * standard minimum-content-size rule; dedup tiny payloads EXACTLY
    * instead (they are cheap to hash whole).
    *
    * Scale shape is [[graft.dedup.Dedup.simhashNearDups]] verbatim: the
    * payload never shuffles (signatures are 16 bytes), candidates shuffle
    * on (band, bucket), and the verify is a bit_count on the joined rows.
    */
  def perceptualNearDups(assets: DataFrame, maxHamming: Int = 3,
      minBytes: Int = 64): DataFrame = {
    // the 4×16-bit banding is exhaustive only up to Hamming 3
    // (pigeonhole: ≤3 differing bits cannot touch all 4 bands); a larger
    // bound would silently MISS qualifying pairs, so reject it loudly
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for the 4-band pigeonhole to be " +
        s"exhaustive, got $maxHamming")
    // the round-robin exchange of the computed 16-byte signatures is
    // load-bearing: both sides of the self-join below read it, and
    // ReuseExchange makes them SHARE one execution of the phash kernel —
    // without it each side recomputes every signature (measured 2×:
    // steady-state 2.9 s → 1.4 s at sf0.1). Payloads still never
    // shuffle; only (asset_id, w0, w1) rows cross the wire.
    val sigs = assets
      .filter(octet_length(col("payload")) >= minBytes)
      .select(col("asset_id"), phashWords(col("payload").cast("string")).as("pw"))
      .select(col("asset_id"),
        element_at(col("pw"), 1).as("w0"), element_at(col("pw"), 2).as("w1"))
      .repartition(assets.sparkSession.sparkContext.defaultParallelism)
    val banded = sigs.select(col("asset_id"), col("w0"), col("w1"),
      posexplode(array(
        shiftrightunsigned(col("w0"), 16), col("w0").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("w1"), 16), col("w1").bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // no pre-join repartition: the (band, bucket) join hash-partitions
    // both sides itself, so a round-robin exchange here is a pure extra
    // shuffle of the banded rows (parallelism for the phash kernel comes
    // from the scan's row-group splits, upstream of the banding)
    val a = banded.select(col("band"), col("bucket"),
      col("asset_id").as("asset_id_a"), col("w0").as("w0_a"), col("w1").as("w1_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("asset_id").as("asset_id_b"), col("w0").as("w0_b"), col("w1").as("w1_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("asset_id_a") < col("asset_id_b"))
      .select(col("asset_id_a"), col("asset_id_b"),
        (bit_count(col("w0_a").bitwiseXOR(col("w0_b"))) +
          bit_count(col("w1_a").bitwiseXOR(col("w1_b")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
