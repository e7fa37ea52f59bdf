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
    val typed = Multimodal.decode(assets.as[Multimodal.Asset])
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

  test("real decode runs map-side over the corpus and is loud on corrupt payloads") {
    val assets = Multimodal.realAssets(Tables.documents(spark, Sf0001))
    val dec = Multimodal.decodeReal(assets).collect()
    // 500 docs: ids ≡ 0, 1 (mod 3) are image/audio → 167 + 167
    assert(dec.length == 334)
    dec.foreach { d =>
      if (d.media_type == "image") {
        assert(d.width == Multimodal.imgW(d.asset_id).toLong)
        assert(d.mean_g == Multimodal.rgbOf(d.asset_id)._2.toLong)
      } else {
        assert(d.n_frames == Multimodal.wavSamples(d.asset_id).toLong)
        assert(d.rms == Multimodal.wavAmplitude(d.asset_id).toLong)
      }
    }
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
}
