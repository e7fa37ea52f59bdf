package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.xform.Transform

/** JSON-lines wire format for the event envelope — the faithful external
  * form of the reference's bus messages (`{Source, DetailType, Time,
  * Detail}` with Detail itself a JSON string — main.py:42-50,
  * transform.ts:20-31). The engine keeps typed structs between stages
  * (SURVEY.md §1.4 fix); this is the boundary where JSON text legitimately
  * exists: landing directories, replay archives, interchange with
  * non-Spark producers.
  *
  * Streaming `readWireStream` + `Rules` filters + `Transform` stages is
  * the complete "event source connector" path: new wire files are
  * detected by the file source (the S3→SQS analogue), parsed once, and
  * flow through the same typed pipeline as any other source.
  */
object WireSource {

  /** The wire envelope schema: `detail` is a JSON STRING on the wire. */
  val wireSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("detailType", StringType),
    StructField("time", TimestampType),
    StructField("detail", StringType)))

  /** Serialize envelope events (typed `detail` struct) to JSON lines. */
  def writeWire(events: DataFrame, path: String): Unit =
    Transform.toWire(events)
      .write.mode(SaveMode.Overwrite).json(path)

  /** Batch read: wire JSON lines → typed envelope. */
  def readWire(spark: SparkSession, path: String, detailSchema: StructType): DataFrame =
    Transform.fromWire(
      spark.read.schema(wireSchema).json(path), detailSchema)

  /** Streaming read: watched wire directory → typed envelope stream. */
  def readWireStream(
      spark: SparkSession,
      path: String,
      detailSchema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    Transform.fromWire(
      spark.readStream
        .schema(wireSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .json(path),
      detailSchema)
}
