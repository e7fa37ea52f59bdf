package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.KeyedUpsertSink

/** Crash-consistency of the generation-manifest bucketed upsert: a writer
  * killed between staging its bucket files and swapping the manifest must
  * leave readers on the previous consistent generation — never a torn mix
  * of old and new buckets.
  */
class AtomicSinkSpec extends SparkSpec {
  import spark.implicits._

  private def table(path: String): Set[(String, Long, Long)] =
    KeyedUpsertSink.readBucketedAtomic(spark, path)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet

  private def batchDf(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "ts")

  test("crash between bucket writes and manifest swap preserves the old generation") {
    val path = Files.createTempDirectory("graft-atomic").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 8) _

    // batch 0 commits normally
    sink(batchDf(("a", 1L, 10L), ("b", 1L, 10L), ("c", 1L, 10L)), 0L)
    val committed = table(path)
    assert(committed == Set(("a", 1L, 10L), ("b", 1L, 10L), ("c", 1L, 10L)))

    // batch 1 "crashes": every bucket file of the new generation is on
    // disk, but the writer dies before the manifest rename
    val staged = KeyedUpsertSink.writeGeneration(
      spark, path, Seq("k"), Seq(col("ts")), 8,
      batchDf(("a", 2L, 20L), ("d", 1L, 20L)), 1L)
    assert(staged.isDefined)
    assert(Files.exists(java.nio.file.Paths.get(path, "gen-1")))

    // readers still see exactly the pre-crash table
    assert(table(path) == committed)

    // recovery: re-running the batch (same batchId) restages and commits;
    // the merge is LWW so the replay is idempotent
    sink(batchDf(("a", 2L, 20L), ("d", 1L, 20L)), 1L)
    val after = table(path)
    assert(after == Set(("a", 2L, 20L), ("b", 1L, 10L), ("c", 1L, 10L), ("d", 1L, 20L)))

    // vacuum reclaims nothing that the manifest still references
    val removed = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(table(path) == after)
    // gen-0 still holds b and c's current buckets, so it must survive
    assert(!removed.contains("gen-0"))
  }

  test("superseding every bucket makes the old generation vacuumable") {
    val path = Files.createTempDirectory("graft-atomic2").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    // second batch touches the same keys → same buckets → gen-0 dies
    sink(batchDf(("a", 2L, 20L), ("b", 2L, 20L)), 1L)
    assert(table(path) == Set(("a", 2L, 20L), ("b", 2L, 20L)))
    val removed = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(removed == Seq("gen-0"))
    assert(table(path) == Set(("a", 2L, 20L), ("b", 2L, 20L)))
  }

  test("redelivery of an already-committed batchId is a harmless no-op") {
    // The round-5 staging dir was gen-<batchId> reused across attempts:
    // replaying a COMMITTED batch overwrote the very generation the merge
    // plan was lazily reading (and the manifest pointing at) — FileNotFound
    // mid-job and a torn table. Attempt-unique staging dirs make the replay
    // merge old-vs-new into a fresh generation instead.
    val path = Files.createTempDirectory("graft-atomic4").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    sink(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    val committed = table(path)
    assert(committed == Set(("a", 2L, 20L), ("b", 1L, 10L), ("c", 1L, 20L)))

    // at-least-once delivery re-runs batch 1 verbatim
    sink(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    assert(table(path) == committed)
    // the replay staged under a new attempt directory; nothing was torn
    assert(Files.exists(java.nio.file.Paths.get(path, "gen-1")))
    assert(Files.exists(java.nio.file.Paths.get(path, "gen-1-r1")))

    // and a second replay on top of the replay is equally harmless
    sink(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L)
    assert(table(path) == committed)
    val removed = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(table(path) == committed)
    assert(removed.nonEmpty) // superseded attempt dirs are garbage, reclaimed
  }

  test("vacuum never reclaims a freshly-staged (possibly in-flight) generation by default") {
    val path = Files.createTempDirectory("graft-atomic6").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(("a", 1L, 10L)), 0L)
    // a concurrent writer is mid-commit: staged, manifest not yet swapped
    KeyedUpsertSink.writeGeneration(
      spark, path, Seq("k"), Seq(col("ts")), 4, batchDf(("a", 2L, 20L)), 1L)
    // default quiesce dwell: the unreferenced-but-fresh gen-1 SURVIVES —
    // deleting it would tear the in-flight commit
    assert(!KeyedUpsertSink.vacuumGenerations(path).contains("gen-1"))
    assert(Files.exists(java.nio.file.Paths.get(path, "gen-1")))
    // offline maintenance (no writer can be active) reclaims it
    assert(KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L).contains("gen-1"))
  }

  test("empty batches stage nothing and break nothing") {
    val path = Files.createTempDirectory("graft-atomic7").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(), 0L) // empty FIRST batch: no table dir, no manifest
    assert(KeyedUpsertSink.readManifest(path).isEmpty)
    sink(batchDf(("a", 1L, 10L)), 1L)
    sink(batchDf(), 2L) // empty later batch: a no-op
    assert(table(path) == Set(("a", 1L, 10L)))
  }

  test("vacuum grace window keeps the generations of a stalled reader's manifest") {
    val path = Files.createTempDirectory("graft-atomic5").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)

    // a long-running reader resolves the CURRENT manifest (all buckets →
    // gen-0) but hasn't finished scanning yet
    val stalledReader = KeyedUpsertSink.readBucketedAtomic(spark, path)

    // a superseding commit re-points every bucket at gen-1
    sink(batchDf(("a", 2L, 20L), ("b", 2L, 20L)), 1L)

    // grace=1 retains everything the previous committed manifest referenced
    val removed = KeyedUpsertSink.vacuumGenerations(path, graceManifests = 1, quiesceMs = 0L)
    assert(!removed.contains("gen-0"))
    // the stalled reader completes against its resolved (old) generation
    val stale = stalledReader.select("k", "v", "ts")
      .as[(String, Long, Long)].collect().toSet
    assert(stale == Set(("a", 1L, 10L), ("b", 1L, 10L)))

    // without grace, the superseded generation is reclaimed
    val removed0 = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(removed0.contains("gen-0"))
    assert(table(path) == Set(("a", 2L, 20L), ("b", 2L, 20L)))
  }

  test("concurrent manifest commits never lose each other's bucket entries") {
    // the read-modify-rename race: without the per-table lock, two
    // writers both read M0 and the second rename clobbers the first's
    // entries — quietly unreferencing a committed generation
    val path = Files.createTempDirectory("graft-atomic-race").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 16) _
    sink(batchDf(("seed", 1L, 1L)), 0L)
    // disjoint key sets → disjoint touched buckets per writer
    val rowsA = (1 to 40).map(i => (s"a$i", 1L, 10L))
    val rowsB = (1 to 40).map(i => (s"b$i", 1L, 10L))
    val tA = new Thread(() => sink(batchDf(rowsA: _*), 1L))
    val tB = new Thread(() => sink(batchDf(rowsB: _*), 2L))
    tA.start(); tB.start(); tA.join(); tB.join()
    val got = table(path).map(_._1)
    val want = Set("seed") ++ rowsA.map(_._1) ++ rowsB.map(_._1)
    assert(got == want,
      s"lost updates: missing ${want -- got}")
    // and nothing a vacuum would now delete is still referenced
    KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(table(path).map(_._1) == want)
  }

  test("vacuum quiescence reads the DEEP mtime: active nested writes are protected") {
    // an in-flight Spark job writes only under nested _temporary paths,
    // so the gen dir's own mtime goes stale mid-write; the quiescence
    // clock must see the newest mtime in the tree
    val path = Files.createTempDirectory("graft-atomic-mtime").resolve("t").toString
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("k"), Seq(col("ts")), numBuckets = 4) _
    sink(batchDf(("a", 1L, 10L)), 0L)
    // fake an unreferenced in-flight generation: old dir mtime, fresh
    // nested task file
    val gen = java.nio.file.Paths.get(path, "gen-99")
    val nested = gen.resolve("_temporary").resolve("0")
    Files.createDirectories(nested)
    Files.writeString(nested.resolve("part-000"), "in-flight")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600 * 1000L)
    Files.setLastModifiedTime(gen, old)
    Files.setLastModifiedTime(gen.resolve("_temporary"), old)
    // nested part file keeps NOW as its mtime → deep-quiescence says active
    val removed = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 60000L)
    assert(!removed.contains("gen-99"),
      "vacuum reclaimed an actively-written generation (stale dir mtime)")
    // once the whole tree is stale, the crash leftover reclaims
    val s = Files.walk(gen)
    try s.forEach(p => Files.setLastModifiedTime(p, old))
    finally s.close()
    val removed2 = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 60000L)
    assert(removed2.contains("gen-99"))
  }

  test("atomic read-back equals the declarative LWW of all batches") {
    val path = Files.createTempDirectory("graft-atomic3").resolve("t").toString
    val ev = Tables.events(spark, Sf0001).select(col("user_id"),
      col("event_id"), col("ts_us"))
    val sink = KeyedUpsertSink.upsertBucketedAtomic(
      spark, path, Seq("user_id"), Seq(col("ts_us"), col("event_id")), 8) _
    sink(ev.filter(col("event_id") % 2 === 0), 0L)
    sink(ev.filter(col("event_id") % 2 === 1), 1L)
    val got = KeyedUpsertSink.readBucketedAtomic(spark, path)
      .select("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    val want = KeyedUpsertSink.latestByKey(ev, Seq("user_id"),
      Seq(col("ts_us"), col("event_id")))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }
}
