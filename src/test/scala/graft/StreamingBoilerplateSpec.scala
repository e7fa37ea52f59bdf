package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{StreamingBoilerplate, TextAnalysis}

/** Streamed-equals-batch for paragraph-level boilerplate removal: the
  * stripped corpus derived from the maintained (doc_id, paragraph-hash,
  * count) state must equal [[TextAnalysis.removeBoilerplateParagraphs]]
  * over the union of delivered documents — under any arrival order and
  * under at-least-once redelivery, where a naive additive count state
  * would double-count and over-strip.
  */
class StreamingBoilerplateSpec extends SparkSpec {

  /** The same planted-boilerplate wire corpus as the text_boilerplate
    * driver query: NAV header variants, an every-3rd newsletter line, an
    * every-7th low-frequency promo, a universal footer.
    */
  private lazy val wire: DataFrame =
    Tables.documents(spark, Sf0001).select(col("doc_id"),
      concat_ws("\n\n",
        when(col("doc_id") % 2 === 0, lit("NAV Menu  Home About Contact"))
          .otherwise(lit("nav menu home about contact")),
        substring(col("text"), 1, 80),
        when(col("doc_id") % 3 === 0, lit("Subscribe to our newsletter today")),
        substring(col("text"), 81, 120),
        when(col("doc_id") % 7 === 0,
          concat(lit("promo code "), (col("doc_id") % 5).cast("string"))),
        lit("copyright 2026 example site all rights reserved")).as("text"))

  private def rows(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select("doc_id", "clean_text", "n_paras", "n_dropped")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  private lazy val batchWant: Set[(Long, String, Long, Long)] =
    rows(TextAnalysis.removeBoilerplateParagraphs(wire))

  private def runWaves(tag: String, waves: Seq[DataFrame]): String = {
    val root = Files.createTempDirectory(s"graft-sboiler-$tag")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val state = root.resolve("state").toString
    val ckpt = root.resolve("ckpt").toString
    waves.zipWithIndex.foreach { case (w, i) =>
      w.write.parquet(s"$landing/w$i")
      val stream = spark.readStream.schema(wire.schema)
        .option("recursiveFileLookup", "true").parquet(landing)
      StreamingBoilerplate.start(stream, state, ckpt, numBuckets = 8)
        .awaitTermination()
    }
    state
  }

  test("stripped view equals the batch operator over forward waves") {
    assert(batchWant.exists(_._4 > 0), "fixture strips nothing — test is vacuous")
    val state = runWaves("fwd", Seq(
      wire.filter(col("doc_id") % 2 === 0),
      wire.filter(col("doc_id") % 2 === 1)))
    assert(rows(StreamingBoilerplate.strippedView(spark, state, wire)) == batchWant)
  }

  test("arrival order does not change the stripped corpus") {
    val state = runWaves("rev", Seq(
      wire.filter(col("doc_id") % 2 === 1),
      wire.filter(col("doc_id") % 2 === 0)))
    assert(rows(StreamingBoilerplate.strippedView(spark, state, wire)) == batchWant)
  }

  test("redelivered waves do not double-count; state holds hashes and counts only") {
    val even = wire.filter(col("doc_id") % 2 === 0)
    // `even` arrives three times in total; a per-ph additive state would
    // inflate those docs' paragraph counts 3× and over-strip
    val state = runWaves("redeliver", Seq(even, wire, even))
    assert(rows(StreamingBoilerplate.strippedView(spark, state, wire)) == batchWant)
    // state schema = (doc_id, ph, n): md5 hashes and counts, never text
    val st = StreamingBoilerplate.counts(spark, state)
    assert(st.columns.toSet == Set("doc_id", "ph", "n"))
    assert(st.select(max(length(col("ph")))).head().getInt(0) == 32)
    // and the maintained counts equal the batch-computed paragraph counts
    val streamedFreq = st.groupBy("ph").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batchFreq = wire
      .select(explode(split(col("text"), "\n\n")).as("para"))
      .select(md5(lower(regexp_replace(trim(col("para")), "\\s+", " "))).as("ph"))
      .groupBy("ph").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamedFreq == batchFreq)
  }

  test("a doc redelivered WITHIN one micro-batch counts once") {
    // cross-batch replays are absorbed by the (doc_id, ph) LWW keying,
    // but a duplicate INSIDE one trigger reaches the same groupBy and
    // would double that doc's counts — and order=Seq(n) then keeps the
    // inflated row forever, over-stripping near-threshold paragraphs
    val dupWave = wire.unionAll(wire.filter(col("doc_id") % 3 === 0))
    val state = runWaves("intradup", Seq(dupWave))
    assert(rows(StreamingBoilerplate.strippedView(spark, state, wire)) == batchWant)
    // the maintained per-doc counts equal the single-copy batch counts
    val st = StreamingBoilerplate.counts(spark, state)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = wire
      .select(col("doc_id"), explode(split(col("text"), "\n\n")).as("para"))
      .select(col("doc_id"),
        md5(lower(regexp_replace(trim(col("para")), "\\s+", " "))).as("ph"))
      .groupBy("doc_id", "ph").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(st == want)
  }
}
