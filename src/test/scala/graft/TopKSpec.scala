package graft

import org.apache.spark.sql.functions._

import graft.analytics.Queries
import graft.functions.TopK

/** The bounded-heap top-k aggregate must equal the window formulation
  * exactly — including across partition merges (the serialize/merge path
  * runs because input is repartitioned).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_desc equals window row_number<=k on the orders table") {
    val win = Queries.topOrdersPerCustomer(spark, Sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    val agg = Queries.topOrdersPerCustomerAgg(spark, Sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(agg == win)
    assert(agg.nonEmpty)
  }

  test("merge across many partitions keeps global top-k per group") {
    val df = (1 to 1000).map(i => (i % 7, i.toDouble, i.toLong))
      .toDF("g", "score", "id")
      .repartition(16) // force partial buffers + serialize + merge
    val got = df.groupBy("g")
      .agg(TopK.top_k_desc(struct(col("score"), col("id")), 2).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
      .as[(Int, Double, Long)].collect().toSet
    val want = (1 to 1000).map(i => (i % 7, i.toDouble, i.toLong))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._2, -r._3)).take(2)
      }.toSet
    assert(got == want)
  }
}
