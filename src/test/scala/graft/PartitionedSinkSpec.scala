package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sink.PartitionedSink

/** Partition pruning must reach the scan: a one-day read of the
  * date-partitioned store lists only that day's directory.
  */
class PartitionedSinkSpec extends SparkSpec {

  test("day filter prunes partitions at the scan") {
    val path = Files.createTempDirectory("graft-part").resolve("events").toString
    val events = Tables.events(spark, Sf0001)
    PartitionedSink.writeDatePartitioned(events, path)

    val day = events.select(date_format(col("ts_utc"), "yyyy-MM-dd").as("d"))
      .groupBy("d").count().orderBy(col("count").desc).head().getString(0)
    val got = PartitionedSink.readDay(spark, path, day)
    val want = events.filter(date_format(col("ts_utc"), "yyyy-MM-dd") === day).count()
    assert(got.count() == want)

    val scan = got.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // pruned scan: only the selected day's files survive into the input RDD
    assert(scan.metadata("PartitionFilters").contains("day"))
    val readFiles: Seq[String] = scan.inputRDD.partitions.toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }
    assert(readFiles.nonEmpty && readFiles.forall(_.contains(s"day=$day")))
  }
}
