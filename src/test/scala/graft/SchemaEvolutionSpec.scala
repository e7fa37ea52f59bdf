package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sink.KeyedUpsertSink

/** The schema-evolution contract of the versioned keyed sinks, chosen
  * deliberately (pre-contract behavior was whatever parquet union does):
  * the first versioned commit records the column contract in manifest
  * metadata; ADDED columns widen-with-nulls and the contract grows
  * atomically with the commit; a batch DROPPING or RETYPING a committed
  * column is refused loudly at the writer — never a silent null-fill or
  * a read-time coercion three consumers away.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private def order = Seq(col("ts"))

  private def newTable(tag: String): String =
    Files.createTempDirectory(tag).resolve("t").toString

  private def delta(path: String)(batch: DataFrame, batchId: Long) =
    KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, order, numBuckets = 4, compactAfter = 0)(batch, batchId)

  test("the contract records at first commit and widens atomically with adding batches") {
    val path = newTable("graft-schema-widen")
    delta(path)(Seq(("a", 1L, 10L)).toDF("k", "v", "ts"), 0L)
    val s0 = KeyedUpsertSink.storedSchema(path)
      .getOrElse(fail("first commit must record the column contract"))
    assert(s0.fieldNames.toSeq == Seq("k", "v", "ts"))
    assert(s0("v").dataType == LongType)
    // an ADDING batch widens: the contract grows with the commit
    delta(path)(Seq(("b", 2L, 20L, "x")).toDF("k", "v", "ts", "extra"), 1L)
    val s1 = KeyedUpsertSink.storedSchema(path).get
    assert(s1.fieldNames.toSeq == Seq("k", "v", "ts", "extra"))
    assert(s1("extra").dataType == StringType)
    // older rows read null in the widened column
    val got = KeyedUpsertSink.readBucketedDelta(spark, path)
      .select("k", "extra").as[(String, Option[String])].collect().toSet
    assert(got == Set(("a", None), ("b", Some("x"))))
  }

  test("retyping a committed column is refused loudly, never coerced at read time") {
    val path = newTable("graft-schema-retype")
    delta(path)(Seq(("a", 1L, 10L)).toDF("k", "v", "ts"), 0L)
    val err = intercept[IllegalArgumentException] {
      delta(path)(Seq(("b", "two", 20L)).toDF("k", "v", "ts"), 1L)
    }
    assert(err.getMessage.contains("retypes committed column(s)"))
    assert(err.getMessage.contains("v (table: bigint, batch: string)"),
      err.getMessage)
    // the refusal left nothing behind: the table still reads clean and
    // a conforming batch commits
    delta(path)(Seq(("b", 2L, 20L)).toDF("k", "v", "ts"), 1L)
    assert(KeyedUpsertSink.readBucketedDelta(spark, path).count() == 2)
  }

  test("dropping a committed column is refused loudly; typed nulls are the explicit way") {
    val path = newTable("graft-schema-drop")
    delta(path)(Seq(("a", 1L, 10L)).toDF("k", "v", "ts"), 0L)
    val err = intercept[IllegalArgumentException] {
      delta(path)(Seq(("b", 20L)).toDF("k", "ts"), 1L)
    }
    assert(err.getMessage.contains("drops committed column(s) v"))
    assert(err.getMessage.contains("lit(null)"))
    delta(path)(Seq(("b", 20L)).toDF("k", "ts")
      .withColumn("v", lit(null).cast("long")), 1L)
    val got = KeyedUpsertSink.readBucketedDelta(spark, path)
      .select("k", "v").as[(String, Option[Long])].collect().toSet
    assert(got == Set(("a", Some(1L)), ("b", None)))
  }

  test("a widened table streams its fixed-at-start schema until restart, then the wide one") {
    val root = Files.createTempDirectory("graft-schema-stream")
    val table = root.resolve("t").toString
    delta(table)(Seq(("a", 1L, 10L)).toDF("k", "v", "ts"), 0L)
    // stream 1 starts on the narrow schema and drains the bootstrap
    val ckpt = root.resolve("ckpt").toString
    def drainCols(): Seq[String] = {
      var cols: Seq[String] = Seq.empty
      val q = spark.readStream.format("graft-changes")
        .option("path", table).option("startingVersion", "0")
        .load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          cols = df.columns.toSeq; df.count(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      cols
    }
    assert(drainCols() == Seq("k", "v", "ts"))
    // a widening commit lands mid-stream-lifetime
    delta(table)(Seq(("b", 2L, 20L, "x")).toDF("k", "v", "ts", "extra"), 1L)
    // the SAME query (same checkpoint) restarts: the v1 Source contract
    // re-resolves the schema at (re)start, so the widened column
    // surfaces now — and the replayed/advanced ranges carry it
    assert(drainCols() == Seq("k", "v", "ts", "extra"))
  }
}
