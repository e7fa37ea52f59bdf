package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sink.KeyedUpsertSink

/** Self-describing keyed tables: the first versioned commit records the
  * key columns and LWW order spec as manifest metadata, every reader can
  * default to the stored spec (`storedSpec` / the path-only overloads /
  * a `graft-changes` read with only `path`), and a MISMATCHED explicit
  * spec — reader or writer — fails loudly instead of silently resolving
  * LWW ties differently than the table's own reads (the documented
  * orderBy footgun this metadata kills). Pre-spec tables keep working
  * with explicit specs and adopt the metadata on their next commit.
  */
class SelfDescribingSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private def order = Seq(col("ts"))

  private def batchDf(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "ts")

  private def newTable(tag: String): String =
    Files.createTempDirectory(tag).resolve("t").toString

  private def delta(path: String)(batch: DataFrame, batchId: Long) =
    KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, order, numBuckets = 4, compactAfter = 0)(batch, batchId)

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.select("k", "v", "ts").as[(String, Long, Long)].collect().toSet

  test("first commit records the spec; path-only reads equal explicit-spec reads") {
    val path = newTable("graft-sds-basic")
    delta(path)(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    delta(path)(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    // the spec is readable back
    val (sk, so) = KeyedUpsertSink.storedSpec(path)
      .getOrElse(fail("first versioned commit must record the spec"))
    assert(sk == Seq("k"))
    assert(so.size == 1)
    // every path-only reader equals its explicit-spec twin
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path)) ==
      rows(KeyedUpsertSink.readBucketedDelta(spark, path, keys, order)))
    assert(rows(KeyedUpsertSink.readChangesBetween(spark, path, 1L)) ==
      rows(KeyedUpsertSink.readChangesBetween(spark, path, keys, order, 1L)))
    val req = Seq("a", "c").toDF("k")
    assert(rows(KeyedUpsertSink.lookupBucketed(spark, path, req)) ==
      rows(KeyedUpsertSink.lookupBucketed(spark, path, keys, order, req)))
    // time travel through the stored spec
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path, Some(1L))) ==
      Set(("a", 1L, 10L), ("b", 1L, 10L)))
  }

  test("a mismatched reader or writer spec fails loudly, never resolves ties differently") {
    val path = newTable("graft-sds-mismatch")
    delta(path)(batchDf(("a", 1L, 10L)), 0L)
    // second commit on the same key: the bucket now carries a 2-chain,
    // so the compactor below has a target to refuse on
    delta(path)(batchDf(("a", 2L, 20L)), 1L)
    // reader with a different ORDER — the silent-wrong-LWW class
    val e1 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.readBucketedDelta(spark, path, keys, Seq(col("v")))
    }
    assert(e1.getMessage.contains("silently changes LWW winners"))
    // reader with different KEYS
    val e2 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.readChangesBetween(spark, path, Seq("v"), order, 0L)
    }
    assert(e2.getMessage.contains("mismatched spec"))
    // a WRITER with a different order is refused before it can commit
    // rows whose LWW resolution disagrees with every read of the table
    val e3 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.upsertBucketedDelta(spark, path, keys, Seq(col("v")),
        numBuckets = 4, compactAfter = 0)(batchDf(("b", 1L, 10L)), 2L)
    }
    assert(e3.getMessage.contains("silently changes LWW winners"))
    // ...as are a mismatched compactor and rebucket (they REWRITE rows
    // under their spec)
    val e4 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.compactBucketChains(spark, path, keys, Seq(col("v")),
        minChain = 1)
    }
    assert(e4.getMessage.contains("silently changes LWW winners"))
    val e5 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.rebucketTable(spark, path, Seq("v"), order, 8)
    }
    assert(e5.getMessage.contains("silently changes LWW winners"))
    // the matching spec still reads fine after all the refusals
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path)) ==
      Set(("a", 2L, 20L)))
  }

  test("graft-changes with only `path` streams and batch-reads under the stored spec") {
    val root = Files.createTempDirectory("graft-sds-src")
    val table = root.resolve("t").toString
    delta(table)(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    delta(table)(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    // batch facade: path + fromVersion only
    val facade = spark.read.format("graft-changes")
      .option("path", table).option("fromVersion", "1").load()
    assert(rows(facade) ==
      rows(KeyedUpsertSink.readChangesBetween(spark, table, keys, order, 1L)))
    // streaming source: path only — full-history bootstrap, no spec options
    val got = scala.collection.mutable.Set.empty[(String, Long, Long)]
    val q = spark.readStream.format("graft-changes")
      .option("path", table).option("startingVersion", "0")
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.select("k", "v", "ts")
          .as[(String, Long, Long)].collect(); ()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.toSet ==
      rows(KeyedUpsertSink.readChangesBetween(spark, table, keys, order, 0L)))
    // half a spec is a misuse, not a default
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-changes")
        .option("path", table).option("keys", "k")
        .option("fromVersion", "1").load()
    }
    assert(e.getMessage.contains("together or neither"))
    // an explicit MISMATCHED spec through the facade fails loudly too
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-changes")
        .option("path", table).option("keys", "k").option("orderBy", "v")
        .option("fromVersion", "1").load()
    }
    assert(e2.getMessage.contains("silently changes LWW winners"))
  }

  test("pre-spec tables keep working explicitly and adopt the spec on their next commit") {
    val path = newTable("graft-sds-upgrade")
    delta(path)(batchDf(("a", 1L, 10L)), 0L)
    // simulate a table written before the spec existed: strip the spec
    // metadata lines from the head manifest (same file format, no spec)
    val head = Files.list(Paths.get(path)).iterator()
    val headFile = {
      import scala.jdk.CollectionConverters._
      val fs = head.asScala.filter(
        _.getFileName.toString.startsWith("_manifest.v")).toList
      fs.maxBy(_.getFileName.toString)
    }
    val stripped = Files.readAllLines(headFile)
    Files.write(headFile, {
      import scala.jdk.CollectionConverters._
      stripped.asScala.filterNot(l =>
        l.startsWith("#keySpec=") || l.startsWith("#orderSpec=")).asJava
    })
    assert(KeyedUpsertSink.storedSpec(path).isEmpty)
    // explicit-spec reads keep working
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path, keys, order)) ==
      Set(("a", 1L, 10L)))
    // a path-only read is LOUD, not a guess
    val e = intercept[IllegalStateException] {
      KeyedUpsertSink.readBucketedDelta(spark, path)
    }
    assert(e.getMessage.contains("no key/order spec metadata"))
    // the next commit records the spec in place — the upgrade path
    delta(path)(batchDf(("b", 1L, 20L)), 1L)
    assert(KeyedUpsertSink.storedSpec(path).nonEmpty)
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path)) ==
      Set(("a", 1L, 10L), ("b", 1L, 20L)))
  }

  test("hostile column names round-trip: digit-led and keyword order columns") {
    // "2d" unquoted re-parses as the DOUBLE literal 2.0 (LWW by a
    // constant — silently wrong rows); "order" is a SQL keyword. The
    // spec stores every attribute part backquoted, so both survive.
    val path = newTable("graft-sds-hostile")
    val rows = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("k", "2d", "order")
    val hostileOrder = Seq(col("2d"), col("order"))
    val sink = KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, hostileOrder, numBuckets = 4, compactAfter = 0) _
    sink(rows, 0L)
    // a stale update loses under the REAL column order (2d: 9 > 1 means
    // the new row wins for a; if the stored spec degenerated to a
    // constant, the later __seq would win regardless — same answer — so
    // ALSO check the inverse: a LOWER 2d loses)
    sink(Seq(("a", 0L, 5L)).toDF("k", "2d", "order"), 1L)
    val got = KeyedUpsertSink.readBucketedDelta(spark, path)
      .select("k", "2d").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 2L)),
      s"stale low-2d update must lose under the stored spec: $got")
  }

  test("composite order expressions round-trip through the stored spec") {
    val path = newTable("graft-sds-expr")
    val compOrder = Seq(col("ts") % 100L, col("v"))
    val sink = KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, compOrder, numBuckets = 4, compactAfter = 0) _
    sink(batchDf(("a", 1L, 110L), ("b", 1L, 120L)), 0L)
    sink(batchDf(("a", 2L, 205L)), 1L) // 205 % 100 = 5 < 10: stale, loses
    val explicitRead =
      rows(KeyedUpsertSink.readBucketedDelta(spark, path, keys, compOrder))
    assert(explicitRead == Set(("a", 1L, 110L), ("b", 1L, 120L)))
    // the stored spec re-parses to the same LWW semantics
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path)) == explicitRead)
    // and the same expression built again compares equal (no false refusal)
    sink(batchDf(("c", 1L, 130L)), 2L)
    assert(rows(KeyedUpsertSink.readBucketedDelta(spark, path)).size == 3)
  }
}
