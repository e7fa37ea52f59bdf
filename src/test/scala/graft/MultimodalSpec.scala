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
