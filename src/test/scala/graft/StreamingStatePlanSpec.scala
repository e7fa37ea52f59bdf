package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.dedup.StreamingDedup
import graft.pipeline.{Curation, StreamingCuration}

/** Plan guards for the streaming state tables: the per-trigger
  * touched-partition claim is only real if the partition filter reaches
  * the state SCAN — a filter evaluated after a full read would be
  * silently O(state) per trigger. Mirrors PartitionedSinkSpec's
  * discipline for the new state layouts.
  */
class StreamingStatePlanSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get

  /** Files the scan ACTUALLY touched (post-partition-pruning): execute,
    * then read the scan node's numFiles metric — `inputFiles` lists the
    * whole table regardless of pruning and cannot see the difference.
    */
  private def filesTouched(df: org.apache.spark.sql.DataFrame): Long = {
    val scan = scanOf(df)
    df.collect()
    scan.metrics("numFiles").value
  }

  test("dedup signature-state read prunes __bkt partitions at the scan") {
    val root = Files.createTempDirectory("graft-plan-dedup")
    val state = root.resolve("state").toString
    StreamingDedup.mergeBatch(spark, state,
      root.resolve("pairs").toString, 2, 64, 16, 0.7, 8)(docs, 0L)
    // the exact read shape mergeBatch issues for a later batch touching
    // a subset of partitions
    val slice = spark.read.parquet(state).filter(col("__bkt").isin(0L, 1L))
    val scan = scanOf(slice)
    assert(scan.metadata("PartitionFilters").contains("__bkt"),
      s"partition filter must reach the scan: ${scan.metadata("PartitionFilters")}")
    assert(filesTouched(slice) < filesTouched(spark.read.parquet(state)),
      "pruned slice must read fewer files than the full state")
  }

  test("curation survivor-state read prunes __bucket partitions at the scan") {
    val root = Files.createTempDirectory("graft-plan-cur")
    val state = root.resolve("state").toString
    val gated = Curation.gates(docs, col("doc_id") % 37 === 0)
    StreamingCuration.mergeBatch(spark,
      graft.dedup.Dedup.benchmarkNgramIndex(docs.filter(col("doc_id") % 37 === 0)),
      state, 40L, 8)(gated, 0L)
    val slice = spark.read.parquet(state).filter(col("__bucket").isin(0L, 1L))
    val scan = scanOf(slice)
    assert(scan.metadata("PartitionFilters").contains("__bucket"),
      s"partition filter must reach the scan: ${scan.metadata("PartitionFilters")}")
    assert(filesTouched(slice) < filesTouched(spark.read.parquet(state)))
  }
}
