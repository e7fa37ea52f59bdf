package graft.tools

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.Tables
import graft.analytics.Layout

/** Dev-only: demonstrate the exchange-free bucketed join at the CLI. */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
        val spark = ProbeCorpus.session(8)
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Layout.writeBucketed(li, "demo_li", "l_orderkey", 8)
    Layout.writeBucketed(ord, "demo_ord", "l_orderkey", 8)
    val joined = Layout.joinBucketed(spark, "demo_li", "demo_ord", "l_orderkey")
    println(s"DEMO joined rows = ${joined.count()}")
    val shuffles = joined.queryExecution.executedPlan.collect { case s: ShuffleExchangeLike => s }
    println(s"DEMO shuffle exchanges in final plan = ${shuffles.size}")
    val salted = Layout.saltedJoin(li, ord, "l_orderkey", 4)
    println(s"DEMO salted rows = ${salted.count()}")
    spark.stop()
  }
}
