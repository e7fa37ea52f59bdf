package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sink.KeyedUpsertSink

/** Plan audit for the round-15 read paths: the lookup's request-set join
  * must be a broadcast semi join, and both paths' scans must list ONLY
  * the pruned buckets' directories.
  */
object LookupPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("lookup-plans")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, sfDir).select(col("user_id"),
      col("event_id"), col("ts_us"))
    val keys = Seq("user_id")
    val order = Seq(col("ts_us"), col("event_id"))
    val path = java.nio.file.Files.createTempDirectory("graft-lkp-plan")
      .resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, order, numBuckets = 16, compactAfter = 0) _
    sink(ev.filter(col("event_id") % 2 === 0), 0L)
    sink(ev.filter(col("event_id") % 2 === 1), 1L)
    val req = ev.select("user_id").where(col("user_id") % 97 === 0).distinct()
    val lkp = KeyedUpsertSink.lookupBucketed(spark, path, keys, order, req)
    lkp.collect() // finalize AQE
    println("=== lookup executed plan ===")
    println(lkp.queryExecution.executedPlan.toString.take(4000))
    val feed = KeyedUpsertSink.readChangesBetween(spark, path, keys, order, 1L)
    feed.collect()
    println("=== change feed executed plan ===")
    println(feed.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
