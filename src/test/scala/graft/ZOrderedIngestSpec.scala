package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.ZOrderedIngest

/** Streaming z-order ingest: content always equals the ingested union,
  * compaction fires on cadence and swaps atomically, replay is
  * idempotent, and the clustered generation still prunes both filter
  * dimensions.
  */
class ZOrderedIngestSpec extends SparkSpec {

  private def mkRows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id").as("event_id"),
      (col("id") % 300).as("user_id"),
      (lit(473352L) + (col("id") / 300).cast("long") % 720).as("hour"),
      md5(col("id").cast("string")).as("payload"))

  test("streamed ingest equals the union; compaction consumes deltas") {
    val dir = Files.createTempDirectory("graft-zing").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 8, 3) _
    ingest(mkRows(0, 20000), 0L)
    ingest(mkRows(20000, 40000), 1L)
    val (gen1, deltas1, _) = ZOrderedIngest.state(dir)
    assert(gen1.isEmpty && deltas1.size == 2, "no compaction before cadence")
    ingest(mkRows(40000, 60000), 2L) // 3rd delta → compaction
    val (gen2, deltas2, upto2) = ZOrderedIngest.state(dir)
    assert(gen2.contains("zgen-0") && deltas2.isEmpty, s"$gen2 $deltas2")
    assert(upto2 == 2L)
    ingest(mkRows(60000, 70000), 3L) // fresh delta atop the generation
    val got = ZOrderedIngest.read(spark, dir)
    assert(got.count() == 70000)
    assert(got.unionByName(mkRows(0, 70000)).distinct().count() == 70000,
      "ingested content diverged from the union")
  }

  test("batch replay is idempotent, including a replay after its own compaction") {
    val dir = Files.createTempDirectory("graft-zing-replay").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 8, 2) _
    ingest(mkRows(0, 10000), 0L)
    ingest(mkRows(0, 10000), 0L) // plain redelivery before compaction
    ingest(mkRows(10000, 20000), 1L) // compacts → zgen-0
    // redelivery AFTER the compaction consumed the delta (crash between
    // compaction and checkpoint commit): the watermark makes it a no-op
    ingest(mkRows(10000, 20000), 1L)
    val got = ZOrderedIngest.read(spark, dir)
    assert(got.count() == 20000, "replay must not duplicate rows")
    val (gen, deltas, upto) = ZOrderedIngest.state(dir)
    assert(gen.contains("zgen-0") && deltas.isEmpty && upto == 1L)
  }

  test("the clustered generation prunes both dimensions under a 2-D filter") {
    val dir = Files.createTempDirectory("graft-zing-prune").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 32, 1) _
    ingest(mkRows(0, 200000), 0L) // immediate compaction → zgen-0
    val (gen, deltas, _) = ZOrderedIngest.state(dir)
    assert(gen.contains("zgen-0") && deltas.isEmpty)
    val filtered = ZOrderedIngest.read(spark, dir)
      .filter(col("user_id").between(10, 20) && col("hour").between(473400L, 473420L))
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("user_id") && pushed.contains("hour"),
      s"both dimensions must push down: $pushed")
    assert(filtered.count() ==
      mkRows(0, 200000).filter(col("user_id").between(10, 20)
        && col("hour").between(473400L, 473420L)).count())
  }
}
