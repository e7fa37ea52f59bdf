package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.analytics.Layout

/** Physical-layout guarantees: bucketed joins must plan with no shuffle;
  * salted joins must preserve join semantics exactly.
  */
class LayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("bucketed fact-to-fact join plans with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, Sf0001).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(ord, "ord_bucketed", "l_orderkey", 8)
    val joined = Layout.joinBucketed(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
    val n = joined.count() // force final adaptive plan
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"expected exchange-free bucketed join, got:\n${plan.toString.take(2000)}")
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, "l_orderkey")
      .groupBy("l_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Layout.saltedJoin(li, ord, "l_orderkey", salt = 4)
      .groupBy("l_orderkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("morton2 matches a reference bit interleave and orders rectangles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (12345L, 67890L),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (0x12345678L, 0x0FEDCBA9L))
    val got = samples.toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")))
      .as[Long].collect()
    samples.map { case (a, b) => ref(a, b) }.zip(got).foreach {
      case (want, g) => assert(g == want, s"interleave mismatch: $g != $want")
    }
  }
}
