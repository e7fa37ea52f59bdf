package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.CsvExtract
import graft.multimodal.Multimodal

/** Multimodal plumbing + ingestion quarantine. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("typed mapPartitions decode equals the expression decode") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, Sf0001))
    val typed = assets.as[Multimodal.Asset]
      .mapPartitions(_.map(MultimodalSpec.decodeStubFixture))
      .toDF().orderBy("asset_id")
      .collect()
    val expr = Multimodal.decodeExpr(assets)
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("width").cast("int"), col("height").cast("int"), col("n_frames").cast("int"))
      .orderBy("asset_id").collect()
    assert(typed.length == expr.length && typed.length == 500)
    typed.zip(expr).foreach { case (t, e) => assert(t == e) }
  }

  test("frame features are deterministic per (asset, frame)") {
    val decoded = Multimodal.decodeExpr(
      Multimodal.syntheticAssets(Tables.documents(spark, Sf0001)))
    val f1 = Multimodal.frameFeatures(Multimodal.sampleFrames(decoded))
      .orderBy("asset_id", "frame_idx").collect()
    val f2 = Multimodal.frameFeatures(Multimodal.sampleFrames(decoded))
      .orderBy("asset_id", "frame_idx").collect()
    assert(f1.sameElements(f2))
    assert(f1.nonEmpty)
  }

  test("real codecs: decode recovers the closed-form ground truth from actual PNG/WAV bytes") {
    // pure-kernel property across a spread of ids (0 included; step 7 is
    // coprime to every modulus in play, so all three media classes and a
    // range of dims/amplitudes are exercised): the decoder reads BYTES —
    // any agreement with the closed forms is a real codec parse
    (0L until 600L by 7L).foreach { id =>
      val img = Multimodal.decodeMedia(
        Multimodal.Asset(id, "image", Multimodal.encodePng(id)))
      assert((img.width, img.height) ==
        (Multimodal.imgW(id).toLong, Multimodal.imgH(id).toLong))
      val (r, g, b) = Multimodal.rgbOf(id)
      assert((img.mean_r, img.mean_g, img.mean_b) ==
        (r.toLong, g.toLong, b.toLong))
      assert(img.n_frames == 1L && img.sample_rate == 0L && img.rms == 0L)
      val wav = Multimodal.decodeMedia(
        Multimodal.Asset(id, "audio", Multimodal.encodeWav(id)))
      assert(wav.n_frames == Multimodal.wavSamples(id).toLong)
      assert(wav.sample_rate == Multimodal.WavRate.toLong)
      // ±A square wave: RMS is exactly A
      assert(wav.rms == Multimodal.wavAmplitude(id).toLong)
    }
  }

  test("real GIF codec: frames recover per-frame dims and colors; the summary means average across frames; corrupt is loud") {
    (0L until 600L by 7L).foreach { id =>
      val bytes = Multimodal.encodeGif(id)
      val frames = Multimodal.decodeVideoFrames(id, bytes)
      assert(frames.length == Multimodal.vidFrames(id))
      frames.foreach { fr =>
        assert((fr.width, fr.height) ==
          (Multimodal.vidW(id).toLong, Multimodal.vidH(id).toLong))
        val (r, g, b) = Multimodal.vidRgb(id, fr.frame_idx.toInt)
        // constant-fill frames round-trip bit-exactly through the
        // GIF palette — recovered means ARE the planted colors
        assert((fr.mean_r, fr.mean_g, fr.mean_b) ==
          (r.toLong, g.toLong, b.toLong), s"id=$id frame=${fr.frame_idx}")
      }
      // the summary row: first-frame dims, frame count, means averaged
      // over all frames (uniform dims ⇒ floor(Σ frame-color / n))
      val sum = Multimodal.decodeMedia(Multimodal.Asset(id, "video", bytes))
      val n = Multimodal.vidFrames(id)
      assert((sum.width, sum.height, sum.n_frames) ==
        (Multimodal.vidW(id).toLong, Multimodal.vidH(id).toLong, n.toLong))
      assert(sum.mean_r ==
        (0 until n).map(f => Multimodal.vidRgb(id, f)._1.toLong).sum / n)
      assert(sum.mean_g ==
        (0 until n).map(f => Multimodal.vidRgb(id, f)._2.toLong).sum / n)
      assert(sum.mean_b ==
        (0 until n).map(f => Multimodal.vidRgb(id, f)._3.toLong).sum / n)
      assert(sum.sample_rate == 0L && sum.rms == 0L)
    }
    // corrupt/truncated GIF bytes carry the asset id
    val garbage = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFrames(11L, Array[Byte](1, 2, 3, 4, 5))
    }
    assert(garbage.getMessage.contains("asset 11"))
    val truncated = intercept[Exception] {
      Multimodal.decodeVideoFrames(12L,
        Multimodal.encodeGif(12L).take(40)).foreach(_ => ())
    }
    assert(truncated.getMessage.contains("asset 12") ||
      truncated.getMessage.contains("12"), truncated.getMessage)
  }

  test("JPEG lossy contract: dims exact, channel error measured within the pinned tolerance, corrupt loud, drift flips the verdict") {
    // direct kernel sweep: dims recover exactly; the REAL max channel
    // error across a broad id range stays under JpegTol (re-measuring
    // here is what catches silent tolerance creep — a decoder change
    // pushing err past 2 should make a human re-derive the bound, not
    // ride the headroom silently)
    var maxErr = 0L
    (0L until 900L by 3L).foreach { id =>
      val bytes = Multimodal.encodeJpeg(id)
      val v = Multimodal.jpegVerdictOf(Multimodal.Asset(id, "image", bytes))
      assert((v.width, v.height) ==
        (Multimodal.imgW(id).toLong, Multimodal.imgH(id).toLong),
        s"id=$id: JPEG must preserve dimensions exactly")
      assert(v.within_tol, s"id=$id: max_err=${v.max_err} past tolerance")
      maxErr = math.max(maxErr, v.max_err)
    }
    assert(maxErr <= 2L,
      s"measured max channel error $maxErr — the documented basis for " +
        "JpegTol=4 was 2; re-derive the tolerance before riding headroom")
    // the verdict actually bites: an impossible tolerance flips it
    assert(!Multimodal.jpegVerdictOf(
      Multimodal.Asset(5L, "image", Multimodal.encodeJpeg(5L)),
      tol = -1L).within_tol)
    // corrupt/truncated payloads surface the asset id, never a silent row
    val corrupt = intercept[IllegalArgumentException] {
      Multimodal.jpegVerdictOf(Multimodal.Asset(77L, "image",
        Multimodal.encodeJpeg(77L).take(24)))
    }
    assert(corrupt.getMessage.contains("asset 77"))
    // the Dataset pipeline over a mixed partition: map-side, exact ids
    val ds = Multimodal.decodeJpegVerdict(Multimodal.realJpegAssets(
      Tables.documents(spark, Sf0001)))
    val rows = ds.collect()
    assert(rows.length == 167) // 500 docs, doc_id % 3 == 0
    assert(rows.forall(_.within_tol))
  }

  test("real decode runs map-side over the corpus and is loud on corrupt payloads") {
    val assets = Multimodal.realAssets(Tables.documents(spark, Sf0001))
    val dec = Multimodal.decodeReal(assets).collect()
    // 500 docs: every modality decodes for real now
    assert(dec.length == 500)
    dec.foreach { d =>
      d.media_type match {
        case "image" =>
          assert(d.width == Multimodal.imgW(d.asset_id).toLong)
          assert(d.mean_g == Multimodal.rgbOf(d.asset_id)._2.toLong)
        case "audio" =>
          assert(d.n_frames == Multimodal.wavSamples(d.asset_id).toLong)
          assert(d.rms == Multimodal.wavAmplitude(d.asset_id).toLong)
        case _ =>
          assert(d.n_frames == Multimodal.vidFrames(d.asset_id).toLong)
          assert(d.width == Multimodal.vidW(d.asset_id).toLong)
      }
    }
    // the distributed per-frame video decode recovers every frame
    val vf = Multimodal.decodeVideoReal(assets).collect()
    assert(vf.length == dec.filter(_.media_type == "video")
      .map(_.n_frames).sum)
    // an unrecognized payload names its asset...
    val garbage = intercept[IllegalArgumentException] {
      Multimodal.decodeMedia(
        Multimodal.Asset(7L, "image", Array[Byte](1, 2, 3, 4, 5)))
    }
    assert(garbage.getMessage.contains("asset 7"))
    // ...and so does a TRUNCATED stream (ImageIO throws mid-read there
    // instead of returning null — both paths carry the id)
    val truncated = intercept[IllegalArgumentException] {
      Multimodal.decodeMedia(
        Multimodal.Asset(8L, "image", Multimodal.encodePng(8L).take(24)))
    }
    assert(truncated.getMessage.contains("asset 8"))
    val notWav = intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(9L, Array[Byte](1, 2, 3, 4, 5))
    }
    assert(notWav.getMessage.contains("asset 9"))
  }

  test("WAV walker: chunk-order agnostic, skips unknown chunks, stereo frame math, refuses non-PCM16") {
    import java.nio.{ByteBuffer, ByteOrder}
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    def wav(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      b.array()
    }
    def fmt(channels: Int, rate: Int, bits: Int, code: Int = 1): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(code.toShort).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * bits / 8)
        .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      b.array()
    }
    // stereo, 3 frames of ±100 per channel, a junk LIST chunk FIRST and
    // the data chunk BEFORE fmt — the container allows any order
    val samples = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    Seq(100, -100, 100, -100, 100, -100).foreach(s => samples.putShort(s.toShort))
    val d = Multimodal.decodeWavPcm16(1L, wav(
      chunk("LIST", Array.fill[Byte](7)(0x55)), // odd length → pad byte
      chunk("data", samples.array()),
      chunk("fmt ", fmt(2, 44100, 16))))
    assert(d.n_frames == 3L && d.sample_rate == 44100L && d.rms == 100L)
    // 8-bit or non-PCM is refused loudly, never silently mis-sized
    val bits8 = intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(2L, wav(
        chunk("fmt ", fmt(1, 8000, 8)), chunk("data", Array[Byte](1, 2))))
    }
    assert(bits8.getMessage.contains("PCM 16-bit"))
    val float = intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(3L, wav(
        chunk("fmt ", fmt(1, 8000, 16, code = 3)),
        chunk("data", Array[Byte](1, 2))))
    }
    assert(float.getMessage.contains("PCM 16-bit"))
  }

  test("real resize rescales actual pixels with the resizePlan arithmetic; constant means survive") {
    val assets = Multimodal.realAssets(Tables.documents(spark, Sf0001))
    Seq((224, 224), (64, 64), (100, 50)).foreach { case (tw, th) =>
      val out = Multimodal.resizeReal(assets, tw, th).collect()
      assert(out.length == 167)
      out.foreach { o =>
        val (w, h) = (Multimodal.imgW(o.asset_id).toLong,
          Multimodal.imgH(o.asset_id).toLong)
        val scaleNum = math.min(tw * h, th * w)
        assert((o.out_w, o.out_h) == (scaleNum / h, scaleNum / w),
          s"asset ${o.asset_id} at box ${tw}x$th")
        val (r, g, b) = Multimodal.rgbOf(o.asset_id)
        assert((o.mean_r, o.mean_g, o.mean_b) == (r.toLong, g.toLong, b.toLong))
      }
    }
  }

  test("perceptualNearDups: planted one-char-edit payload copies are always found") {
    import spark.implicits._
    // the recall guarantee holds above the minBytes=64 degenerate-signature
    // guard (tiny payloads are excluded by contract — dedup them exactly)
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
      .filter(length(col("text")) >= 64)
    // substitute one char at position 30 — a different offset than the
    // driver query, so the recall property isn't tied to one byte
    val mutated = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(substring(col("text"), 1, 29), lit("#"),
          col("text").substr(lit(31), length(col("text")))).as("text"))
    val planted = mutated.select((col("doc_id") - 100000L).as("a"), col("doc_id").as("b"))
      .as[(Long, Long)].collect().toSet
    val pairs = Multimodal.perceptualNearDups(
      Multimodal.syntheticAssets(docs.unionByName(mutated)))
    val got = pairs.select("asset_id_a", "asset_id_b").as[(Long, Long)].collect().toSet
    assert(planted.subsetOf(got),
      s"missed planted copies: ${planted -- got}") // exhaustive for hamming<=3
    // a localized edit flips at most 2 block bits (the touched block per word)
    val h = pairs.filter(col("asset_id_b") >= 100000L)
      .select(max("hamming")).as[Long].head()
    assert(h <= 2, s"one-char edit should stay within 2 signature bits, got $h")
  }

  test("phash codegen kernel equals the interpreted HOF reference on the corpus") {
    val docs = Tables.documents(spark, Sf0001)
      .unionByName(Tables.documents(spark, Sf0001)
        .select((col("doc_id") + 1000L).as("doc_id"),
          substring(col("text"), 1, 3).as("text"),
          col("lang"), col("source"), col("n_chars"))) // short/empty-block edge
    val mismatch = docs.select(
      Multimodal.phashWords(col("text")).as("k"),
      Multimodal.phashWordsHof(col("text")).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(mismatch == 0)
  }

  test("phash signature: unrelated payloads do not band-collide at sf0.001") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val pairs = Multimodal.perceptualNearDups(Multimodal.syntheticAssets(docs))
    // corpus has no byte-level near-identical payloads (verified against
    // DuckDB during design): zero verified pairs means zero false accepts
    assert(pairs.isEmpty)
  }

  test("corrupt CSV rows land in quarantine, clean rows parse") {
    val dir = Files.createTempDirectory("graft-quarantine")
    Files.writeString(dir.resolve("in.csv"),
      "ID,HouseNum,Street,Town,Zip\n" +
        "1,12,Main Street,Antrim,22876\n" +
        "2,too,many,fields,here,overflow,oops\n" + // malformed: 7 fields for 5 columns
        "3,45,Church Way,Ballymena,18649\n")
    val scanned = CsvExtract.scanWithQuarantine(
      spark, dir.resolve("in.csv").toString,
      Seq("ID", "HouseNum", "Street", "Town", "Zip")).cache()
    val clean = scanned.filter(col("_corrupt_record").isNull)
    val bad = scanned.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt_record").contains("overflow"))
    scanned.unpersist()
  }

  test("the real decoders run inside an append-mode streaming query (map-side, no state)") {
    import org.apache.spark.sql.streaming.Trigger
    val assets = Multimodal.realAssets(Tables.documents(spark, Sf0001))
    val batchWant = Multimodal.decodeReal(assets).collect().toSet
    val frameWant = Multimodal.decodeVideoReal(assets).collect().toSet
    val root = java.nio.file.Files.createTempDirectory("graft-mm-stream")
    val landing = java.nio.file.Files.createDirectory(root.resolve("in")).toString
    assets.filter(_.asset_id % 2 == 0).toDF().write.parquet(s"$landing/w0")
    assets.filter(_.asset_id % 2 == 1).toDF().write.parquet(s"$landing/w1")
    def stream = spark.readStream.schema(assets.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
      .as[Multimodal.Asset]
    val q1 = Multimodal.decodeReal(stream).toDF()
      .writeStream.format("memory").queryName("mm_dec_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck1").toString)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    assert(spark.table("mm_dec_stream").as[Multimodal.DecodedMedia]
      .collect().toSet == batchWant)
    val q2 = Multimodal.decodeVideoReal(stream).toDF()
      .writeStream.format("memory").queryName("mm_vid_stream")
      .outputMode("append")
      .option("checkpointLocation", root.resolve("ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("mm_vid_stream").as[Multimodal.VideoFrame]
      .collect().toSet == frameWant)
  }
}

object MultimodalSpec {
  /** The OLD synthetic decode stub, demoted to a test fixture once
    * every modality gained a real codec (round 18): it survives only to
    * pin decodeExpr's arithmetic against an independent formulation.
    * Lives on the companion so the mapPartitions closure serializes
    * without capturing the suite.
    */
  def decodeStubFixture(a: Multimodal.Asset): Multimodal.Decoded = {
    val n = a.payload.length.toLong
    Multimodal.Decoded(a.asset_id, a.media_type, n,
      (n % 640).toInt + 16, ((n * 7) % 480).toInt + 16,
      if (a.media_type == "video") (n % 120).toInt + 1 else 1)
  }
}
