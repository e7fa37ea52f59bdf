package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * Two tiers. The SYNTHETIC-ARITHMETIC tier ([[decodeExpr]] and
  * friends) derives metadata from opaque payloads as pure column
  * expressions — the plan shape without a codec. The REAL tier
  * (rounds 17-18) parses actual bytes with pure-JDK codecs: ImageIO
  * PNG for images, a hand-written RIFF/WAVE PCM16 walker for audio,
  * and ImageIO's animated-GIF reader/writer for video — every
  * modality decodes for real now; no stub remains in main. Around
  * both tiers the distributed design is the same:
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

  /** SYNTHETIC-ARITHMETIC decode over the opaque text-payload corpus —
    * pure column expressions (whole-stage codegen, DuckDB-expressible).
    * Not a codec: it demonstrates the metadata-derivation plan shape
    * on payloads that aren't real media. The REAL codec tier below
    * (PNG/WAV/GIF, round 17-18) is where bytes are actually parsed;
    * the old `decodeStub` mapPartitions twin was demoted to a test
    * fixture once every modality gained a real kernel
    * (MultimodalSpec pins this expression's parity against it).
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

  // ─────────────────────────────── real pure-JDK codecs (round 17)
  //
  // "The sandbox ships no codecs" was true of libjpeg/ffmpeg — but the
  // JDK itself ships javax.imageio (PNG/BMP/GIF/JPEG) and RIFF/WAVE PCM
  // is a trivially hand-parseable container. This tier replaces the
  // labeled decode stub with REAL codec kernels for images and audio:
  // the corpus below encodes actual PNG, WAV and (round 18) animated
  // GIF bytes whose parameters derive from doc_id in closed form, so a
  // from-scratch SQL oracle knows the ground truth the decoder must
  // RECOVER from the bytes — a hash match proves a real parse, not
  // replayed arithmetic. Video rides the GIF container (the one video
  // format the JDK can both write and read frame-by-frame): per-frame
  // dims and channel means are read back from DECODED frames.

  /** Decoded-media row from the REAL codecs. All-numeric fields are
    * Long so the oracle's BIGINT arithmetic compares exactly; fields of
    * the other modality are 0 (`mean_*` for audio, `sample_rate`/`rms`
    * for images — a PCM "frame" is one sample across channels, so
    * `n_frames` is the sample count there).
    */
  case class DecodedMedia(
      asset_id: Long, media_type: String,
      width: Long, height: Long, n_frames: Long,
      mean_r: Long, mean_g: Long, mean_b: Long,
      sample_rate: Long, rms: Long)

  /** Resized-image row from the REAL pixel resize. */
  case class ResizedImage(asset_id: Long, out_w: Long, out_h: Long,
      mean_r: Long, mean_g: Long, mean_b: Long)

  // ImageIO defaults to a DISK-backed stream cache per encode/decode —
  // a silent per-row tmp-file round-trip on the hot map path. In-memory
  // only; set once per executor JVM when the object loads.
  javax.imageio.ImageIO.setUseCache(false)

  /** Closed-form corpus parameters (mirrored in the DuckDB oracles —
    * the decode queries are checkable only because these are public
    * arithmetic over doc_id).
    */
  def imgW(id: Long): Int = 16 + (id % 48).toInt
  def imgH(id: Long): Int = 16 + ((id * 7) % 32).toInt
  def rgbOf(id: Long): (Int, Int, Int) =
    (((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)
  def wavSamples(id: Long): Int = 256 + (id % 512).toInt
  def wavAmplitude(id: Long): Short = (500 + (id % 1000)).toShort
  val WavRate: Int = 8000
  def vidW(id: Long): Int = 16 + (id % 32).toInt
  def vidH(id: Long): Int = 16 + ((id * 5) % 24).toInt
  def vidFrames(id: Long): Int = 4 + (id % 28).toInt
  def vidRgb(id: Long, f: Int): (Int, Int, Int) =
    (((id * 37 + f * 11) % 256).toInt,
      ((id * 59 + f * 23) % 256).toInt,
      ((id * 83 + f * 31) % 256).toInt)

  /** An actual PNG: constant-fill `rgbOf(id)` at `imgW(id)×imgH(id)`,
    * encoded by the JDK's ImageIO PNG writer.
    */
  def encodePng(id: Long): Array[Byte] = {
    val (r, g, b) = rgbOf(id)
    val img = new java.awt.image.BufferedImage(
      imgW(id), imgH(id), java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    pngBytes(img)
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "JDK ImageIO has no PNG writer — not a Java SE runtime?")
    bos.toByteArray
  }

  /** An actual RIFF/WAVE file: 16-bit PCM mono at [[WavRate]], a ±A
    * square wave (`A = wavAmplitude(id)`, alternating every sample) —
    * chosen because its RMS is EXACTLY A (all |s| = A), so the oracle
    * can state the decoder's output in closed form.
    */
  def encodeWav(id: Long): Array[Byte] = {
    val a = wavAmplitude(id)
    val samples = Array.tabulate(wavSamples(id))(i =>
      if (i % 2 == 0) a else (-a).toShort)
    encodeWavPcm16(samples, WavRate)
  }

  /** Minimal RIFF/WAVE writer: `RIFF(WAVE fmt data)`, PCM 16-bit mono,
    * little-endian throughout (the format's own byte order).
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** An actual animated GIF: `vidFrames(id)` frames of constant fill
    * `vidRgb(id, f)` at `vidW(id)×vidH(id)`, written by the JDK's
    * ImageIO GIF sequence writer. GIF palettes are exact 24-bit colors
    * (no chroma subsampling), so constant-fill frames round-trip
    * bit-exactly — which is what lets the DuckDB oracle state every
    * recovered frame's ground truth in closed form over doc_id.
    */
  def encodeGif(id: Long): Array[Byte] = {
    val frames = (0 until vidFrames(id)).map { f =>
      val (r, g, b) = vidRgb(id, f)
      val img = new java.awt.image.BufferedImage(
        vidW(id), vidH(id), java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      img
    }
    gifBytes(frames)
  }

  /** Multi-frame GIF container write (`prepareWriteSequence` →
    * `writeToSequence` per frame) — each frame lands as a full image
    * with its own palette, no inter-frame delta encoding.
    */
  def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext,
      "JDK ImageIO has no GIF writer — not a Java SE runtime?")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img => writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** The REAL media corpus over the documents table — every modality
    * carries actual encoded bytes now: PNG (ids ≡ 0 mod 3), RIFF/WAVE
    * PCM16 (≡ 1), animated GIF (≡ 2).
    */
  def realAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 => Asset(id, "image", encodePng(id))
        case 1 => Asset(id, "audio", encodeWav(id))
        case _ => Asset(id, "video", encodeGif(id))
      }
    }
  }

  // ───────────────────────────── lossy-codec contract (round 19: JPEG)
  //
  // Every codec above was chosen because it round-trips BIT-EXACTLY
  // into a closed-form oracle; the dominant real-world image codec is
  // lossy. The JPEG tier is the template for every float-tolerant
  // kernel this engine will ever need: the decode is REAL (ImageIO's
  // JPEG reader; corrupt bytes stay loud-with-asset-id), the
  // verification is TOLERANCE-BASED against the closed-form truth, and
  // what the query EMITS is the exact part — dimensions (JPEG
  // preserves them losslessly) plus the boolean verdict `max channel
  // error <= JpegTol` — so the driver's hash compare stays exact while
  // the tolerance absorbs the codec's bounded error. A decoder drift
  // past the tolerance flips the verdict and fails the hash; a parse
  // failure throws with the asset id.

  /** Channel tolerance for the JPEG verdict. The corpus is
    * constant-fill, so JPEG's error sources are the YCbCr round-trip
    * (±~2/channel) and DC quantization at quality 0.9 (≤ ±1 for the
    * small quant steps at that quality; constant blocks have no AC
    * energy, and partial MCUs pad by edge replication — still
    * constant). Measured max over the sf0.1 corpus: 2; pinned at 4 for
    * JDK-decoder headroom (MultimodalSpec re-measures the real max so
    * silent tolerance creep is caught).
    */
  val JpegTol: Long = 4L

  /** An actual JPEG of the SAME closed-form image as [[encodePng]]
    * (constant fill `rgbOf(id)` at `imgW(id)×imgH(id)`), encoded by
    * the JDK's ImageIO JPEG writer at an explicit quality — the
    * default writer param would float with the JDK.
    */
  def encodeJpeg(id: Long, quality: Float = 0.9f): Array[Byte] = {
    val (r, g, b) = rgbOf(id)
    val img = new java.awt.image.BufferedImage(
      imgW(id), imgH(id), java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    require(writers.hasNext, "JDK ImageIO has no JPEG writer")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** The JPEG slice of the corpus: the image-modality ids
    * (doc_id % 3 == 0) re-encoded lossily — the exact-PNG twin of each
    * asset lives in [[realAssets]], which is what makes this tier's
    * tolerance contract auditable asset-by-asset.
    */
  def realJpegAssets(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].filter(_ % 3 == 0)
      .map(id => Asset(id, "image", encodeJpeg(id)))
  }

  /** The bounded-error verdict row: dims are exact; `max_err` is the
    * decoder-dependent diagnostic (NOT for hashing — it may move a
    * level between JDK decoders); `within_tol` is the contract.
    */
  case class JpegVerdict(asset_id: Long, width: Long, height: Long,
      max_err: Long, within_tol: Boolean)

  /** Partition-local REAL JPEG decode + tolerance verification against
    * the closed-form truth. Same loud contract as every codec here:
    * corrupt or truncated payloads throw with the asset id.
    */
  def decodeJpegVerdict(assets: Dataset[Asset],
      tol: Long = JpegTol): Dataset[JpegVerdict] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(jpegVerdictOf(_, tol)))
  }

  /** The row-level JPEG verdict kernel (see [[decodeJpegVerdict]]). */
  def jpegVerdictOf(a: Asset, tol: Long = JpegTol): JpegVerdict = {
    val img = readImage(a.asset_id, a.payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val (sr, sg, sb) = rgbSums(img)
    val n = w.toLong * h
    val (tr, tg, tb) = rgbOf(a.asset_id)
    val err = Seq(sr / n - tr, sg / n - tg, sb / n - tb)
      .map(math.abs).max
    JpegVerdict(a.asset_id, w.toLong, h.toLong, err, err <= tol)
  }

  /** REAL decode kernel: ImageIO for images (any JDK-readable format,
    * not just the corpus's PNGs), the RIFF walker for audio, the GIF
    * frame reader for video. Loud on an undecodable payload — a
    * corrupt blob must surface its asset id, never a silent skip or a
    * garbage row.
    */
  def decodeMedia(a: Asset): DecodedMedia = a.media_type match {
    case "image" => decodeImage(a.asset_id, a.payload)
    case "audio" => decodeWavPcm16(a.asset_id, a.payload)
    case "video" => decodeVideoSummary(a.asset_id, a.payload)
    case other => throw new IllegalArgumentException(
      s"asset ${a.asset_id}: no codec for media_type '$other' " +
        "(this tier decodes image, audio and video)")
  }

  /** ImageIO with the loud-with-asset-id contract: unreadable formats
    * return null from ImageIO and truncated/corrupt streams THROW from
    * inside the reader — both must surface the asset, never a silent
    * skip or an anonymous IIOException from deep in a task.
    */
  private def readImage(id: Long,
      payload: Array[Byte]): java.awt.image.BufferedImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"asset $id: image decode failed mid-stream (corrupt or " +
            s"truncated payload): ${e.getMessage}", e)
      }
    require(img != null,
      s"asset $id: payload is not a JDK-decodable image (unsupported " +
        "or unrecognized format)")
    img
  }

  /** Channel SUMS over every pixel (not means — callers divide by
    * their own pixel total, which is what lets the video summary take
    * an exact mean across frames).
    */
  private def rgbSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  private def decodeImage(id: Long, payload: Array[Byte]): DecodedMedia = {
    val img = readImage(id, payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val (sr, sg, sb) = rgbSums(img)
    val n = w.toLong * h
    DecodedMedia(id, "image", w, h, 1L, sr / n, sg / n, sb / n, 0L, 0L)
  }

  /** One decoded video frame, everything read back from the bytes. */
  case class VideoFrame(asset_id: Long, frame_idx: Long,
      width: Long, height: Long, mean_r: Long, mean_g: Long, mean_b: Long)

  /** Frame-by-frame GIF decode with the loud-with-asset-id contract:
    * no registered reader, zero frames, or a mid-stream IOException
    * (truncated/corrupt container) all surface the asset. Frames
    * decode as full images (the writer emits no inter-frame deltas;
    * a reader composing deltas would still return full rasters).
    */
  def decodeVideoFrames(id: Long, payload: Array[Byte]): Seq[VideoFrame] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"asset $id: payload is not a JDK-decodable image sequence " +
          "(unsupported or unrecognized format)")
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n =
          try reader.getNumImages(true)
          catch {
            case e: java.io.IOException => throw new IllegalArgumentException(
              s"asset $id: video frame count failed (corrupt or " +
                s"truncated payload): ${e.getMessage}", e)
          }
        require(n > 0, s"asset $id: video payload decodes to zero frames")
        (0 until n).map { f =>
          val img =
            try reader.read(f)
            catch {
              case e: java.io.IOException => throw new IllegalArgumentException(
                s"asset $id: video frame $f decode failed mid-stream " +
                  s"(corrupt or truncated payload): ${e.getMessage}", e)
            }
          val (sr, sg, sb) = rgbSums(img)
          val npx = img.getWidth.toLong * img.getHeight
          VideoFrame(id, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
            sr / npx, sg / npx, sb / npx)
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** The per-asset summary row of a decoded video: first frame's dims
    * (the corpus is constant-dim; a mixed-dim container would still
    * report its first frame), frame count, channel means over ALL
    * pixels of ALL frames — exact long arithmetic, so with uniform
    * frame dims it equals floor(Σ frame-mean / n_frames), the form the
    * oracle states in closed form.
    */
  private def decodeVideoSummary(id: Long, payload: Array[Byte]): DecodedMedia = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"asset $id: payload is not a JDK-decodable image sequence " +
          "(unsupported or unrecognized format)")
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n =
          try reader.getNumImages(true)
          catch {
            case e: java.io.IOException => throw new IllegalArgumentException(
              s"asset $id: video frame count failed (corrupt or " +
                s"truncated payload): ${e.getMessage}", e)
          }
        require(n > 0, s"asset $id: video payload decodes to zero frames")
        var (tr, tg, tb, tpx) = (0L, 0L, 0L, 0L)
        var (w0, h0) = (0L, 0L)
        var f = 0
        while (f < n) {
          val img =
            try reader.read(f)
            catch {
              case e: java.io.IOException => throw new IllegalArgumentException(
                s"asset $id: video frame $f decode failed mid-stream " +
                  s"(corrupt or truncated payload): ${e.getMessage}", e)
            }
          if (f == 0) { w0 = img.getWidth.toLong; h0 = img.getHeight.toLong }
          val (sr, sg, sb) = rgbSums(img)
          tr += sr; tg += sg; tb += sb
          tpx += img.getWidth.toLong * img.getHeight
          f += 1
        }
        DecodedMedia(id, "video", w0, h0, n.toLong,
          tr / tpx, tg / tpx, tb / tpx, 0L, 0L)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Minimal RIFF walker: verify `RIFF…WAVE`, then scan chunks for
    * `fmt ` (require PCM 16-bit) and `data`; stats stream over the
    * sample words. Chunk-order agnostic and skips unknown chunks (the
    * container allows both), refusing loudly on anything non-PCM16.
    */
  def decodeWavPcm16(id: Long, payload: Array[Byte]): DecodedMedia = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII")
    }
    require(payload.length >= 12 && ascii(4) == "RIFF" &&
      { buf.getInt; ascii(4) == "WAVE" },
      s"asset $id: payload is not a RIFF/WAVE file")
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (buf.remaining() >= 8 && (bits < 0 || dataOff < 0)) {
      val cid = ascii(4); val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"asset $id: truncated WAV chunk '$cid' (len $len, " +
          s"${buf.remaining()} remaining)")
      if (cid == "fmt ") {
        require(len >= 16, s"asset $id: fmt chunk too short ($len)")
        val fmt = buf.getShort(buf.position()).toInt
        channels = buf.getShort(buf.position() + 2).toInt
        rate = buf.getInt(buf.position() + 4)
        bits = buf.getShort(buf.position() + 14).toInt
        require(fmt == 1 && bits == 16,
          s"asset $id: only PCM 16-bit WAV is supported " +
            s"(format=$fmt, bits=$bits)")
      } else if (cid == "data") {
        dataOff = buf.position(); dataLen = len
      }
      // chunks pad to even, but a final odd chunk may omit the pad byte
      buf.position(math.min(buf.position() + len + (len & 1), buf.limit()))
    }
    require(bits == 16 && dataOff >= 0,
      s"asset $id: WAV missing fmt or data chunk")
    require(channels > 0, s"asset $id: WAV fmt declares $channels channels")
    val nFrames = dataLen / 2 / channels
    var sumSq = 0L
    var i = 0
    while (i < dataLen / 2) {
      val s = buf.getShort(dataOff + i * 2).toLong
      sumSq += s * s
      i += 1
    }
    val rms =
      if (dataLen == 0) 0L
      else math.round(math.sqrt(sumSq.toDouble / (dataLen / 2)))
    DecodedMedia(id, "audio", 0L, 0L, nFrames.toLong,
      0L, 0L, 0L, rate.toLong, rms)
  }

  /** Partition-local REAL decode over ALL modalities — one iterator
    * per partition; payloads never shuffle: the decode runs where the
    * scan put them.
    */
  def decodeReal(assets: Dataset[Asset]): Dataset[DecodedMedia] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeMedia))
  }

  /** Partition-local per-frame video decode: one row per RECOVERED
    * frame (dims + channel means read back from the pixels). The
    * frame fan-out happens inside the partition — payloads never
    * shuffle, and downstream per-frame work starts from rows, not
    * blobs.
    */
  def decodeVideoReal(assets: Dataset[Asset]): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "video")
      .mapPartitions(_.flatMap(a => decodeVideoFrames(a.asset_id, a.payload)))
  }

  /** REAL pixel resize: fit the image into `targetW×targetH` preserving
    * aspect ratio with the SAME integer arithmetic as [[resizePlan]]
    * (so the plan query and the kernel can never disagree), then
    * actually rescale the pixels (Graphics2D) and report the output
    * dimensions and channel means READ BACK from the resized image.
    */
  def resizeReal(assets: Dataset[Asset],
      targetW: Int = 224, targetH: Int = 224): Dataset[ResizedImage] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "image").mapPartitions(_.map { a =>
      val src = readImage(a.asset_id, a.payload)
      val scaleNum = math.min(
        targetW.toLong * src.getHeight, targetH.toLong * src.getWidth)
      val outW = (scaleNum / src.getHeight).toInt
      val outH = (scaleNum / src.getWidth).toInt
      val dst = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = dst.createGraphics()
      try gfx.drawImage(src, 0, 0, outW, outH, null)
      finally gfx.dispose()
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < outH) {
        var x = 0
        while (x < outW) {
          val p = dst.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = outW.toLong * outH
      ResizedImage(a.asset_id, outW.toLong, outH.toLong,
        sr / n, sg / n, sb / n)
    })
  }
}
