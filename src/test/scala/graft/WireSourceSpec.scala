package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ingest.{CsvExtract, WireSource}
import graft.route.Rules
import graft.xform.Transform

/** Wire-format round trip: typed events → JSON lines on disk → batch and
  * streaming re-ingestion through the same routing/transform pipeline.
  */
class WireSourceSpec extends SparkSpec {

  private lazy val events =
    CsvExtract.toEvents(CsvExtract.scan(spark, SparkEntry.AddressCsv))
  private lazy val detailSchema =
    events.schema("detail").dataType.asInstanceOf[StructType]

  test("batch wire round trip preserves payloads and routing") {
    val dir = Files.createTempDirectory("graft-wire").resolve("out").toString
    WireSource.writeWire(events, dir)
    val back = WireSource.readWire(spark, dir, detailSchema)
    assert(back.filter(Rules.transformRule).count() == 5)
    val ids = back.select(element_at(col("detail.data"), "ID"))
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("1", "2", "3", "4", "5"))
  }

  test("streaming wire source feeds the typed pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft-wire-stream").resolve("in").toString
    WireSource.writeWire(events, dir)
    val stream = WireSource.readWireStream(spark, dir, detailSchema)
    val addresses = Transform.toAddress(
      Transform.transformStage(stream.filter(Rules.transformRule))
        .filter(Rules.loadRule))
    val q = addresses.writeStream.format("memory").queryName("wire_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wire_out")
    assert(rows.count() == 5)
    assert(rows.filter(col("id") === "3").head()
      .getAs[String]("street_address") == "Church Way")
  }
}
