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

  test("classifierScore (kernel) equals classifierScoreHof on every document") {
    val fast = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect()
    val slow = TextAnalysis.classifierScoreHof(docs).orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.length == 500)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
    // both keep and cut classes are populated (threshold isn't degenerate)
    val kept = TextAnalysis.classifierScore(docs).filter(col("keep")).count()
    assert(kept > 0 && kept < 500)
  }

  test("classifierScore: zero-token docs get NULL score and keep=false") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "the cat sat")).toDF("doc_id", "text")
    val rows = TextAnalysis.classifierScore(docs).orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(!rows(0).getBoolean(rows(0).fieldIndex("keep")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("score")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("score")))
  }
}
