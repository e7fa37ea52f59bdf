package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.{ChangeFeedConsumer, KeyedUpsertSink}

/** The incremental-consumption loop end to end: a downstream LWW table
  * maintained ONLY from change-feed polls must equal the upstream table
  * after arbitrary commit waves — including a consumer crash between
  * processing and checkpointing (the range replays; the idempotent
  * downstream absorbs it), idle polls, and a stall past the vacuum keep
  * window failing loudly rather than silently skipping history.
  */
class ChangeFeedConsumerSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private def order = Seq(col("ts"))

  private def batchDf(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "ts")

  private def table(path: String): Set[(String, Long, Long)] =
    KeyedUpsertSink.readBucketedDelta(spark, path, keys, order)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet

  test("a downstream table maintained from feed polls equals the upstream") {
    val root = Files.createTempDirectory("graft-cfc")
    val up = root.resolve("up").toString
    val down = root.resolve("down").toString
    val ckpt = root.resolve("ckpt").toString
    val upSink = KeyedUpsertSink.upsertBucketedDelta(
      spark, up, keys, order, numBuckets = 4, compactAfter = 0) _
    // downstream batch ids: the consumer's own replay counter is fine —
    // the LWW merge makes duplicate application a no-op regardless
    var downBatch = 0L
    def apply(df: DataFrame): Unit = {
      KeyedUpsertSink.upsertBucketedDelta(
        spark, down, keys, order, numBuckets = 4, compactAfter = 0)(
        df, { downBatch += 1; downBatch })
      ()
    }
    upSink(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    assert(ChangeFeedConsumer.bootstrap(
      spark, up, keys, order, ckpt)(apply).contains(1L))
    assert(table(down) == table(up))
    // an idle poll processes nothing and does not touch the downstream
    assert(ChangeFeedConsumer.processNew(
      spark, up, keys, order, ckpt)(apply).isEmpty)
    // two more upstream waves, one poll each
    upSink(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    assert(ChangeFeedConsumer.processNew(
      spark, up, keys, order, ckpt)(apply).contains((1L, 2L)))
    assert(table(down) == table(up))
    // two commits between polls: one range covers both
    upSink(batchDf(("d", 1L, 30L)), 2L)
    upSink(batchDf(("a", 3L, 40L)), 3L)
    assert(ChangeFeedConsumer.processNew(
      spark, up, keys, order, ckpt)(apply).contains((2L, 4L)))
    assert(table(down) == table(up))
  }

  test("a crash between process and checkpoint replays the range to a no-op") {
    val root = Files.createTempDirectory("graft-cfc-crash")
    val up = root.resolve("up").toString
    val down = root.resolve("down").toString
    val ckpt = root.resolve("ckpt").toString
    val upSink = KeyedUpsertSink.upsertBucketedDelta(
      spark, up, keys, order, numBuckets = 4, compactAfter = 0) _
    var downBatch = 0L
    def apply(df: DataFrame): Unit = {
      KeyedUpsertSink.upsertBucketedDelta(
        spark, down, keys, order, numBuckets = 4, compactAfter = 0)(
        df, { downBatch += 1; downBatch })
      ()
    }
    upSink(batchDf(("a", 1L, 10L)), 0L)
    ChangeFeedConsumer.bootstrap(spark, up, keys, order, ckpt)(apply)
    upSink(batchDf(("a", 2L, 20L), ("b", 1L, 20L)), 1L)
    // the crash: process applies the range, then the consumer dies
    // BEFORE the checkpoint advances
    object Boom extends RuntimeException("crash after apply")
    intercept[Boom.type] {
      ChangeFeedConsumer.processNew(spark, up, keys, order, ckpt) { df =>
        apply(df); throw Boom
      }
    }
    assert(table(down) == table(up), "the crashed range WAS applied")
    // restart: the same range replays (at-least-once) and the LWW
    // downstream absorbs it; the checkpoint finally advances
    assert(ChangeFeedConsumer.processNew(
      spark, up, keys, order, ckpt)(apply).contains((1L, 2L)))
    assert(table(down) == table(up))
    assert(ChangeFeedConsumer.processNew(
      spark, up, keys, order, ckpt)(apply).isEmpty)
  }

  test("corrupt checkpoints, double bootstraps, and recreated tables all fail loudly") {
    val root = Files.createTempDirectory("graft-cfc-guards")
    val up = root.resolve("up").toString
    val ckpt = root.resolve("ckpt").toString
    val upSink = KeyedUpsertSink.upsertBucketedDelta(
      spark, up, keys, order, numBuckets = 4, compactAfter = 0) _
    upSink(batchDf(("a", 1L, 10L)), 0L)
    ChangeFeedConsumer.bootstrap(spark, up, keys, order, ckpt)(_ => ())
    // a second bootstrap would silently reprocess the whole table
    val err = intercept[IllegalArgumentException] {
      ChangeFeedConsumer.bootstrap(spark, up, keys, order, ckpt)(_ => ())
    }
    assert(err.getMessage.contains("already holds checkpoint v1"))
    // ...unless forced, which is the documented deliberate path
    assert(ChangeFeedConsumer.bootstrap(
      spark, up, keys, order, ckpt, force = true)(_ => ()).contains(1L))
    // a checkpoint that exists but does not parse is corruption, NOT a
    // fresh consumer — conflating them steers into a full reprocess
    Files.writeString(java.nio.file.Paths.get(ckpt), "not-a-version")
    val err2 = intercept[IllegalStateException] {
      ChangeFeedConsumer.processNew(spark, up, keys, order, ckpt)(_ => ())
    }
    assert(err2.getMessage.contains("does not parse as a version"))
    // a recreated table (head below the checkpoint) is named as such,
    // not misreported as a reversed range
    Files.writeString(java.nio.file.Paths.get(ckpt), "9")
    val err3 = intercept[IllegalStateException] {
      ChangeFeedConsumer.processNew(spark, up, keys, order, ckpt)(_ => ())
    }
    assert(err3.getMessage.contains("the table was recreated"))
    // an empty/mistyped table path fails with context, not 'empty.max'
    Files.writeString(java.nio.file.Paths.get(ckpt), "1")
    val err4 = intercept[IllegalStateException] {
      ChangeFeedConsumer.processNew(spark, root.resolve("nope").toString,
        keys, order, ckpt)(_ => ())
    }
    assert(err4.getMessage.contains("no committed versions"))
  }

  test("an unbootstrapped consumer and a vacuum-stalled consumer fail loudly") {
    val root = Files.createTempDirectory("graft-cfc-stall")
    val up = root.resolve("up").toString
    val ckpt = root.resolve("ckpt").toString
    val upSink = KeyedUpsertSink.upsertBucketedDelta(
      spark, up, keys, order, numBuckets = 4, compactAfter = 0) _
    upSink(batchDf(("a", 1L, 10L)), 0L)
    val err = intercept[IllegalStateException] {
      ChangeFeedConsumer.processNew(spark, up, keys, order, ckpt)(_ => ())
    }
    assert(err.getMessage.contains("no checkpoint"))
    // bootstrap, stall the consumer, and prune its checkpointed version
    // (stands in for a vacuum prune): the poll must surface manifestAt's
    // loud error, never silently skip the missing history
    ChangeFeedConsumer.bootstrap(spark, up, keys, order, ckpt)(_ => ())
    upSink(batchDf(("b", 1L, 20L)), 1L)
    Files.delete(java.nio.file.Paths.get(up, f"_manifest.v${1L}%020d"))
    val err2 = intercept[NoSuchElementException] {
      ChangeFeedConsumer.processNew(spark, up, keys, order, ckpt)(_ => ())
    }
    assert(err2.getMessage.contains("no readable manifest v1"))
  }
}
