package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ingest.CsvExtract
import graft.pipeline.EtlPipeline
import graft.route.Rules
import graft.sink.KeyedUpsertSink
import graft.xform.Transform

/** End-to-end + operator tests for the reference-parity pipeline
  * (SURVEY.md §5.2.1, §5.2.4).
  */
class EtlPipelineSpec extends SparkSpec {

  test("typed Dataset[Address] surface: case-class Encoder round trip") {
    import spark.implicits._
    val ds: org.apache.spark.sql.Dataset[graft.model.Address] =
      EtlPipeline.runBatch(spark, SparkEntry.AddressCsv).as[graft.model.Address]
    val first = ds.collect().sortBy(_.id).head
    assert(first == graft.model.Address("1", "12", "Main Street", "Antrim", "22876"))
  }

  test("address.csv replays to the 5 expected renamed rows (golden)") {
    val out = EtlPipeline.runBatch(spark, SparkEntry.AddressCsv)
    assert(out.columns.toSeq ==
      Seq("id", "house_number", "street_address", "town", "zip"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 5)
    assert(rows.head == Row("1", "12", "Main Street", "Antrim", "22876"))
    assert(rows.last == Row("5", "89", "Dublin Boulevard", "Swords", "72648"))
  }

  test("quoted comma fields survive the pipeline (fixes reference's lossy round-trip)") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath,
      "ID,HouseNum,Street,Town,Zip\n9,4,\"Main St, Apt 4\",Derry,11111\n")
    val out = EtlPipeline.runBatch(spark, f.getAbsolutePath).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("street_address") == "Main St, Apt 4")
  }

  test("duplicate ids resolve last-write-wins by order column") {
    import spark.implicits._
    val df = Seq(("1", "old", 1L), ("1", "new", 2L), ("2", "only", 1L))
      .toDF("id", "v", "seq")
    val out = KeyedUpsertSink.latestByKey(df, Seq("id"), Seq(col("seq")))
      .orderBy("id").collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "new"), ("2", "only")))
  }

  test("routing rules match exactly the reference's patterns (F1/F2/F3)") {
    val events = CsvExtract.toEvents(CsvExtract.scan(spark, SparkEntry.AddressCsv))
    assert(events.filter(Rules.transformRule).count() == 5) // extraction events
    assert(events.filter(Rules.loadRule).count() == 0)      // wrong stage
    assert(events.filter(Rules.observeRule).count() == 5)   // catch-all
    val transformed = Transform.transformStage(events.filter(Rules.transformRule))
    assert(transformed.filter(Rules.loadRule).count() == 5)
    assert(transformed.filter(Rules.transformRule).count() == 0)
    assert(transformed.filter(Rules.observeRule).count() == 5) // multicast
  }

  test("zipNaive reproduces JS index-zip semantics (short row -> null, extras dropped)") {
    import spark.implicits._
    val df = Seq(("a,b,c", "1,2"), ("a,b", "1,2,3")).toDF("headers", "data")
    val maps = df.select(Transform.zipNaive(col("headers"), col("data")).as("m"))
      .as[Map[String, String]].collect()
    assert(maps(0) == Map("a" -> "1", "b" -> "2", "c" -> null))
    assert(maps(1) == Map("a" -> "1", "b" -> "2")) // "3" silently dropped
  }

  test("wire round-trip preserves the envelope") {
    val events = CsvExtract.toEvents(CsvExtract.scan(spark, SparkEntry.AddressCsv))
    val schema = events.schema("detail").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val back = Transform.fromWire(Transform.toWire(events), schema)
    assert(back.select("detail.data").orderBy(col("detail.data")("ID")).collect().toSeq ==
      events.select("detail.data").orderBy(col("detail.data")("ID")).collect().toSeq)
  }

  test("general EventBridge matchers: prefix/suffix/anything-but/numeric/exists/wildcard") {
    import spark.implicits._
    import Rules.Match._
    val bus = Seq(
      ("aws.s3", "OBJECT_CREATED", Some(42.0)),
      ("aws.ec2", "OBJECT_REMOVED", Some(7.0)),
      ("custom.app", "OBJECT_CREATED", None))
      .toDF("source", "detail_type", "size")
    def n(fields: Map[String, Seq[Rules.Match]]): Long =
      bus.filter(Rules.matches(fields)).count()

    assert(n(Map("source" -> Seq(Prefix("aws.")))) == 2)
    assert(n(Map("detail_type" -> Seq(Suffix("_CREATED")))) == 2)
    // anything-but only matches rows where the field is present
    assert(n(Map("source" -> Seq(AnythingBut("aws.ec2")))) == 2)
    assert(n(Map("size" -> Seq(AnythingBut("7.0")))) == 1)
    // numeric bounds conjoin; null never satisfies a numeric matcher
    assert(n(Map("size" -> Seq(Numeric(">" -> 10.0, "<=" -> 100.0)))) == 1)
    assert(n(Map("size" -> Seq(Exists(false)))) == 1)
    assert(n(Map("detail_type" -> Seq(Wildcard("OBJECT_*ED")))) == 3)
    // within a field matchers OR; across fields they AND
    assert(n(Map("source" -> Seq(AnyOf("aws.s3"), Prefix("custom")))) == 2)
    assert(n(Map(
      "source" -> Seq(Prefix("aws.")),
      "detail_type" -> Seq(AnyOf("OBJECT_CREATED")))) == 1)
    // wildcard quoting: regex metacharacters in the literal segments are inert
    assert(n(Map("source" -> Seq(Wildcard("aws.s3")))) == 1)
    assert(n(Map("source" -> Seq(Wildcard("awsxs3")))) == 0)
  }

  test("presence guard skips records missing required nested fields (F4)") {
    import spark.implicits._
    val df = Seq((Some("k"), Some("b")), (None, Some("b")), (Some("k"), None))
      .toDF("key", "bucket")
    assert(df.filter(Rules.presenceGuard(Seq("key", "bucket"))).count() == 1)
  }
}
