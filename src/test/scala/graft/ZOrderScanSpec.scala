package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-ORDER clustered scan: the layout must preserve content exactly, the
  * range filters must reach the parquet scan as pushed filters, and the
  * clustered layout must actually PRUNE — the 2-D filtered read touches
  * a fraction of the bytes a full scan reads.
  */
class ZOrderScanSpec extends SparkSpec {

  private def bytesRead(work: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try { work; Thread.sleep(500) } // drain the listener bus
    finally spark.sparkContext.removeSparkListener(listener)
    bytes.get
  }

  test("z-ordered read equals the same filter on the original table") {
    val zed = SparkEntry.queries("layout_zorder_scan")(spark, Sf0001)
    val orig = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        expr("ts_ms div 3600000").as("hour"), col("event_type"), col("value"))
      .filter(col("user_id").between(3, 7)
        && col("hour").between(473500L, 473560L))
    assert(zed.count() > 0, "filter window must select rows")
    assert(zed.unionByName(orig).distinct().count() == zed.distinct().count(),
      "layout changed content")
    assert(zed.count() == orig.count())
  }

  test("range filters are pushed into the z-ordered parquet scan") {
    val zed = SparkEntry.queries("layout_zorder_scan")(spark, Sf0001)
    val scan = zed.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("user_id") && pushed.contains("hour"),
      s"both dimensions must push down: $pushed")
  }

  test("clustered layout prunes: z-ordered read beats random layout under the same 2-D filter") {
    // same data, same filter, same file count — only the LAYOUT differs,
    // so per-file footer overhead cancels and the bytes-read ratio
    // isolates what the Z-curve buys (at driver sf the absolute bytes
    // are footer-dominated; tools/ZOrderProbe carries the 10× numbers)
    val base = spark.range(200000).select(
      (col("id") % 300).as("user_id"),
      (lit(473352L) + (col("id") / 300).cast("long") % 720).as("hour"),
      md5(col("id").cast("string")).as("payload"))
    val tmp = "/tmp/graft-zorder-spec"
    base.repartition(32).write.mode("overwrite").parquet(s"$tmp/random")
    graft.analytics.Layout.writeZOrdered(base, "user_id", "hour", s"$tmp/zorder", 32)
    def filtered(path: String): DataFrame =
      spark.read.parquet(path).filter(col("user_id").between(10, 40)
        && col("hour").between(473400L, 473460L))
    // identical result set on both layouts
    assert(filtered(s"$tmp/random").count() == filtered(s"$tmp/zorder").count())
    val rand = bytesRead(
      filtered(s"$tmp/random").write.format("noop").mode("overwrite").save())
    val zed = bytesRead(
      filtered(s"$tmp/zorder").write.format("noop").mode("overwrite").save())
    assert(zed < rand / 2,
      s"z-order pruning too weak: $zed vs random-layout $rand bytes read")
  }
}
