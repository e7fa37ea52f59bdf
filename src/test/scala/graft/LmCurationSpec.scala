package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** The LM-curation scorers must actually separate in-distribution from
  * out-of-distribution text: with the English slice as reference/target,
  * English documents score low surprisal / high DSIR weight relative to
  * documents in other languages (whose transitions and vocabulary rarely
  * appear in the model).
  */
class LmCurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("bigram surprisal: reference-language docs are less surprising") {
    val scored = TextAnalysis.bigramSurprisal(docs, col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = scored.groupBy("lang").agg(avg("surprisal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") < means("zh"),
      s"en ${means("en")} must be less surprising than zh ${means("zh")}")
    assert(means("en") < means.filterKeys(_ != "en").values.min,
      s"en must be the least surprising slice: $means")
    // every multi-token doc is scored, all scores positive
    val total = docs.filter(size(TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(scored.count() == total)
    assert(scored.filter(col("surprisal") <= 0).count() == 0)
  }

  test("DSIR weights: target-language docs carry the highest importance") {
    val weighted = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = weighted.groupBy("lang").agg(avg("dsir_w").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") > means.filterKeys(_ != "en").values.max,
      s"en must carry the highest mean importance weight: $means")
    assert(weighted.filter(col("dsir_w") <= 0).count() == 0)
  }
}
