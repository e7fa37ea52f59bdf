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
