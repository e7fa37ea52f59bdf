package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** The single-pass TextStats kernel must agree exactly with the HOF
  * formulations it replaced, on the real corpus.
  */
class TextStatsParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("qualitySignals (kernel) equals qualitySignalsHof on every document") {
    val fast = TextAnalysis.qualitySignals(docs).orderBy("doc_id").collect()
    val slow = TextAnalysis.qualitySignalsHof(docs).orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.length == 500)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
  }

  test("langIdFast equals langId on every document") {
    val both = docs.select(
      TextAnalysis.langIdFast(col("text")).as("fast"),
      TextAnalysis.langId(col("text")).as("slow"))
      .as[(String, String)].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, s) => assert(f == s) }
  }
}
