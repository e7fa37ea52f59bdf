package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Paragraph-level boilerplate removal: planted repeated headers/footers
  * must vanish, unique bodies must survive in order, the normal form
  * must unify case/whitespace variants, and the corpus must never
  * shuffle (frequency agg moves hashes only; the frequent set rides a
  * broadcast).
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private val Sep = "\n\n"

  test("planted header/footer paragraphs are dropped; unique bodies survive in order") {
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq("SITE HEADER NAV", s"unique body one $i", s"unique body two $i",
        "copyright footer text").mkString(Sep))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateParagraphs(docs, maxFreq = 5)
      .orderBy("doc_id").collect()
    assert(out.length == 30)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"unique body one $id${Sep}unique body two $id",
        s"doc $id: ${r.getString(1)}")
      assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    }
  }

  test("normalization unifies case and whitespace variants of one paragraph") {
    val docs = (0 until 12).map { i =>
      val header = if (i % 2 == 0) "Nav  Menu   Home" else " nav menu home "
      (i.toLong, s"$header$Sep body $i")
    }.toDF("doc_id", "text")
    // each cased variant occurs only 6 times, but they share one normal
    // form (12 occurrences) — the canonical hash must see 12 and drop
    val out = TextAnalysis.removeBoilerplateParagraphs(docs, maxFreq = 10)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getString(1) == s" body ${r.getLong(0)}", r.getString(1))
      assert(r.getLong(3) == 1L)
    }
  }

  test("a paragraph at exactly maxFreq occurrences is kept (strictly-greater gate)") {
    val docs = (0 until 5).map(i => (i.toLong, s"shared boundary para$Sep body $i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplateParagraphs(docs, maxFreq = 5)
      .agg(sum("n_dropped")).head().getLong(0)
    assert(out == 0L, "freq == maxFreq must survive")
  }

  test("driver query plan: corpus never shuffles — hashes aggregate, set broadcasts") {
    val df = SparkEntry.queries("text_boilerplate")(spark, Sf0001)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val smj = helper.collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.isEmpty, "rebuild must not shuffle-sort the corpus")
    val exchanges = helper.collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // hash-frequency partial agg + the single-row collect_list agg; both
    // move md5 strings, never document text
    assert(exchanges.size <= 2, s"expected <=2 hash-only shuffles, got ${exchanges.size}")
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("clean_text"),
        s"a shuffle carries document text: $cols")
    }
    val bcast = helper.collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    assert(bcast.nonEmpty, "frequent-hash set must ride a broadcast")
  }
}
