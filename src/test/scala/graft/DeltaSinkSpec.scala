package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.KeyedUpsertSink
import graft.sink.KeyedUpsertSink.OptimisticCommit

/** The merge-on-read delta sink tier: O(batch) appends to per-bucket
  * generation chains with the LWW merge deferred to read time. The
  * contract under test: chain-resolve == merge-on-write over the same
  * batches, racing appends are carried forward through compaction,
  * redelivery is a read-level no-op, time travel reproduces history,
  * and the vacuum keep-window boundary fails LOUDLY rather than
  * committing behind the head.
  */
class DeltaSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batchDf(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "ts")

  private def newTable(tag: String): String =
    Files.createTempDirectory(tag).resolve("t").toString

  private val keys = Seq("k")
  private def order = Seq(col("ts"))

  private def delta(path: String, numBuckets: Int = 4, compactAfter: Int = 0,
      hook: () => Unit = () => ())(batch: DataFrame, batchId: Long): OptimisticCommit =
    KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, order, numBuckets, compactAfter = compactAfter,
      onBeforeFirstCommit = hook)(batch, batchId)
      .getOrElse(fail("non-empty batch must commit"))

  private def table(path: String): Set[(String, Long, Long)] =
    KeyedUpsertSink.readBucketedDelta(spark, path, keys, order)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet

  private def chainLens(path: String): Map[Long, Int] =
    KeyedUpsertSink.readManifest(path)
      .map { case (b, v) => b -> KeyedUpsertSink.chainOf(v).length }

  test("chain-resolved read equals the merge-on-write table over the same batches") {
    val ev = Tables.events(spark, Sf0001).select(col("user_id"),
      col("event_id"), col("ts_us"))
    val k = Seq("user_id")
    val o = Seq(col("ts_us"), col("event_id"))
    val dPath = newTable("graft-delta-parity")
    val wPath = newTable("graft-mow-parity")
    val dSink = KeyedUpsertSink.upsertBucketedDelta(
      spark, dPath, k, o, numBuckets = 8, compactAfter = 0) _
    val wSink = KeyedUpsertSink.upsertBucketedOptimistic(
      spark, wPath, k, o, numBuckets = 8) _
    (0L to 2L).foreach { i =>
      dSink(ev.filter(col("event_id") % 3 === i), i)
      wSink(ev.filter(col("event_id") % 3 === i), i)
    }
    assert(chainLens(dPath).valuesIterator.exists(_ > 1),
      "fixture built no multi-generation chain — parity test is vacuous")
    val got = KeyedUpsertSink.readBucketedDelta(spark, dPath, k, o)
      .select("user_id", "event_id", "ts_us").as[(Long, Long, Long)].collect().toSet
    val want = KeyedUpsertSink.readBucketedAtomic(spark, wPath)
      .select("user_id", "event_id", "ts_us").as[(Long, Long, Long)].collect().toSet
    assert(got == want, "merge-on-read resolve diverged from merge-on-write")
  }

  test("order ties resolve to the later commit; redelivery is a read-level no-op") {
    val path = newTable("graft-delta-redeliver")
    delta(path)(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    // same ts — the later COMMIT must win, mergeLww's batch-beats-existing
    // rule replayed at read time
    delta(path)(batchDf(("a", 2L, 10L)), 1L)
    assert(table(path) == Set(("a", 2L, 10L), ("b", 1L, 10L)))
    // at-least-once redelivery of the SAME batch: rows tie and resolve
    // identically — the replay must not change the table
    delta(path)(batchDf(("a", 2L, 10L)), 1L)
    assert(table(path) == Set(("a", 2L, 10L), ("b", 1L, 10L)))
    // in-batch duplicates compact to one row per key BEFORE the append
    // (two rows reaching read time would tie on __seq)
    delta(path)(batchDf(("c", 1L, 5L), ("c", 2L, 7L)), 2L)
    assert(table(path) == Set(("a", 2L, 10L), ("b", 1L, 10L), ("c", 2L, 7L)))
  }

  test("a delta appended during compaction staging is carried forward") {
    val path = newTable("graft-delta-carry")
    val sink = delta(path, numBuckets = 1) _ // one bucket: the append must hit it
    sink(batchDf(("a", 1L, 10L)), 0L)
    sink(batchDf(("b", 1L, 10L)), 1L)
    sink(batchDf(("a", 2L, 20L)), 2L)
    assert(chainLens(path) == Map(0L -> 3))
    // the racing append lands AFTER the fold staged but BEFORE its first
    // commit attempt — the rewrite-vs-append commute rule must carry it
    // forward behind the compacted generation, not lose it
    var raced = false
    val compacted = KeyedUpsertSink.compactBucketChains(
      spark, path, keys, order, minChain = 2,
      onBeforeFirstCommit = () => {
        raced = true
        sink(batchDf(("c", 1L, 30L), ("a", 9L, 40L)), 3L); ()
      })
    assert(raced && compacted == Seq(0L))
    // chain = [compact-gen, racing-gen]: folded prefix + carried delta
    assert(chainLens(path) == Map(0L -> 2))
    assert(table(path) == Set(("a", 9L, 40L), ("b", 1L, 10L), ("c", 1L, 30L)),
      "the delta appended during compaction was lost")
    // a second compaction folds the carried delta in; the table is stable
    assert(KeyedUpsertSink.compactBucketChains(
      spark, path, keys, order, minChain = 2) == Seq(0L))
    assert(chainLens(path) == Map(0L -> 1))
    assert(table(path) == Set(("a", 9L, 40L), ("b", 1L, 10L), ("c", 1L, 30L)))
  }

  test("auto-compaction past compactAfter folds the chain; vacuum reclaims the deltas") {
    val path = newTable("graft-delta-autocompact")
    val sink = delta(path, numBuckets = 1, compactAfter = 3) _
    val commits = (0L to 3L).map(i => sink(batchDf((s"k$i", i, 10L + i)), i))
    // batch 3 pushed the chain to 4 > compactAfter=3 → auto-fold to 1
    assert(chainLens(path) == Map(0L -> 1))
    val want = (0L to 3L).map(i => (s"k$i", i, 10L + i)).toSet
    assert(table(path) == want)
    // the folded-away delta generations are unreferenced → vacuumable
    val removed = KeyedUpsertSink.vacuumGenerations(path, quiesceMs = 0L)
    assert(commits.map(_.gen).toSet.subsetOf(removed.toSet),
      "superseded delta generations must reclaim")
    assert(table(path) == want, "vacuum changed the resolved table")
  }

  test("mixed-mode: a merge-on-write commit resolves the chains it touches") {
    val path = newTable("graft-delta-mixed")
    val sink = delta(path, numBuckets = 1) _
    sink(batchDf(("a", 1L, 10L)), 0L)
    sink(batchDf(("a", 2L, 20L), ("b", 1L, 20L)), 1L)
    assert(chainLens(path) == Map(0L -> 2))
    // the resolving reader refuses nothing; the schema-blind one refuses
    // LOUDLY (it would return superseded row versions)
    val err = intercept[IllegalArgumentException] {
      KeyedUpsertSink.readBucketedAtomic(spark, path)
    }
    assert(err.getMessage.contains("merge-on-read delta chains"))
    // a merge-on-write commit on the chained bucket resolves the chain
    // first — doubling as that bucket's compaction
    KeyedUpsertSink.upsertBucketedOptimistic(
      spark, path, keys, order, numBuckets = 1)(batchDf(("c", 1L, 30L)), 2L)
    assert(chainLens(path) == Map(0L -> 1))
    assert(KeyedUpsertSink.readBucketedAtomic(spark, path)
      .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet ==
      Set(("a", 2L, 20L), ("b", 1L, 20L), ("c", 1L, 30L)))
  }

  test("schema evolution across deltas: chains union by name with null back-fill") {
    val path = newTable("graft-delta-schema")
    val sink = delta(path) _
    sink(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L)
    sink(Seq(("a", 2L, 20L, "x"), ("c", 1L, 20L, "y"))
      .toDF("k", "v", "ts", "extra"), 1L)
    val got = KeyedUpsertSink.readBucketedDelta(spark, path, keys, order)
      .select("k", "v", "ts", "extra")
      .as[(String, Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      ("a", 2L, 20L, Some("x")),
      ("b", 1L, 10L, None),
      ("c", 1L, 20L, Some("y"))))
  }

  test("time travel: every retained version reproduces its historical table") {
    val path = newTable("graft-delta-history")
    val sink = delta(path) _
    sink(batchDf(("a", 1L, 10L)), 0L)
    sink(batchDf(("a", 2L, 20L), ("b", 1L, 20L)), 1L)
    sink(batchDf(("b", 9L, 30L)), 2L)
    assert(KeyedUpsertSink.tableVersions(path) == Seq(1L, 2L, 3L))
    def at(v: Long): Set[(String, Long, Long)] =
      KeyedUpsertSink.readBucketedDelta(spark, path, keys, order, atVersion = Some(v))
        .select("k", "v", "ts").as[(String, Long, Long)].collect().toSet
    assert(at(1L) == Set(("a", 1L, 10L)))
    assert(at(2L) == Set(("a", 2L, 20L), ("b", 1L, 20L)))
    assert(at(3L) == Set(("a", 2L, 20L), ("b", 9L, 30L)))
    assert(at(3L) == table(path), "head time-travel must equal the live read")
    // a pruned (or never-committed) version fails loudly, never answers
    // a nearby question. v1's file stands in for a vacuum prune — the
    // keep window is deliberately ≥64 versions, far past a spec's reach
    Files.delete(Paths.get(path).resolve(f"_manifest.v${1L}%020d"))
    val err = intercept[NoSuchElementException] { at(1L) }
    assert(err.getMessage.contains("no readable manifest v1"))
    assert(err.getMessage.contains("pruned past the vacuum keep window"))
    val err2 = intercept[NoSuchElementException] { at(99L) }
    assert(err2.getMessage.contains("no readable manifest v99"))
  }

  test("vacuum keep-window boundary: a pruned-base writer fails loudly, never commits behind the head") {
    val path = newTable("graft-delta-pruned")
    delta(path)(batchDf(("a", 1L, 10L)), 0L) // head: v1
    // the writer stages against head v1; "vacuum" prunes v1 before its
    // first commit attempt (the stall the keep window must dwarf). The
    // commit must surface as the documented loud failure — silently
    // publishing v2 behind a re-listed lower head loses the batch
    val err = intercept[IllegalArgumentException] {
      delta(path, hook = () => {
        Files.delete(Paths.get(path).resolve(f"_manifest.v${1L}%020d")); ()
      })(batchDf(("b", 1L, 20L)), 1L)
    }
    assert(err.getMessage.contains("pruned beneath an in-flight writer"))
    // the ADT keeps the diagnosis accurate: nothing was attempted, so the
    // message must NOT claim "v2 exists"
    assert(!err.getMessage.contains("v2 exists"))
  }

  test("tryCommitSuccessor: pruned base returns BasePruned; the residual window throws AFTER publish") {
    val path = newTable("graft-delta-successor")
    delta(path)(batchDf(("a", 1L, 10L)), 0L) // head: v1
    val man = KeyedUpsertSink.readManifest(path)
    // base v5 never existed → BasePruned, nothing attempted
    assert(KeyedUpsertSink.tryCommitSuccessor(path, 5L, man) ==
      KeyedUpsertSink.BasePruned)
    assert(KeyedUpsertSink.tableVersions(path) == Seq(1L))
    // v2 taken by a racer → LostRace
    delta(path)(batchDf(("b", 1L, 20L)), 1L) // head: v2
    assert(KeyedUpsertSink.tryCommitSuccessor(path, 1L,
      man) == KeyedUpsertSink.LostRace)
    // the residual window: base pruned BETWEEN the pre-check and the
    // publish. v3 IS durably published (the message says so) but its
    // visibility can't be guaranteed → loud failure, caller replays
    val err = intercept[IllegalStateException] {
      KeyedUpsertSink.tryCommitSuccessor(path, 2L, man, afterPrecheck = () => {
        Files.delete(Paths.get(path).resolve(f"_manifest.v${2L}%020d")); ()
      })
    }
    assert(err.getMessage.contains("vacuum-pruned inside the v3 publish window"))
    assert(err.getMessage.contains("v3 IS durably published"))
  }

  /** Record which implementation serves each change-feed read. */
  private def recordingPaths[A](body: => A): (A, Seq[String]) = {
    var paths = Seq.empty[String]
    KeyedUpsertSink.onChangesPath = p => paths :+= p
    try (body, paths) finally KeyedUpsertSink.onChangesPath = _ => ()
  }

  test("change feed: pure appends take the append fast path; a compaction falls back to the diff — same rows either way") {
    val path = newTable("graft-feed-path")
    delta(path)(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L) // v1
    delta(path)(batchDf(("a", 2L, 20L), ("c", 1L, 20L)), 1L) // v2
    def weightedFrom1: Set[(String, Long, Long, Long)] =
      KeyedUpsertSink.readChangesWeighted(spark, path, keys, order,
        fromVersion = 1L)
        .select("k", "v", "ts", "__weight")
        .as[(String, Long, Long, Long)].collect().toSet
    // chains are pure suffixes of v1's → the fast path serves, and the
    // netted rows are the exact ±1 set
    val (feedFast, p1) = recordingPaths(weightedFrom1)
    assert(p1 == Seq("append"))
    assert(feedFast == Set(("a", 2L, 20L, 1L), ("c", 1L, 20L, 1L),
      ("a", 1L, 10L, -1L)))
    // compacting folds every chain: v1's chains are no longer prefixes,
    // so the same range must fall back to the full diff — and net the
    // same rows (compaction rewrites files, not data)
    KeyedUpsertSink.compactBucketChains(spark, path, keys, order) // v3
    val (feedDiff, p2) = recordingPaths(weightedFrom1)
    assert(p2 == Seq("diff"))
    assert(feedDiff == feedFast)
    // and a compaction-only range nets nothing through the diff path
    val (compactOnly, p3) = recordingPaths {
      KeyedUpsertSink.readChangesWeighted(spark, path, keys, order,
        fromVersion = 2L).count()
    }
    assert(p3 == Seq("diff") && compactOnly == 0L)
  }

  test("change feed: a null-keyed row's retraction survives the append fast path") {
    // keys may carry null VALUES (only a missing key column is
    // refused); the fast path's before-image semi-join must be
    // null-safe or the null key's -1 image silently vanishes and a
    // downstream maintained aggregate double-counts it
    val path = newTable("graft-feed-nullkey")
    def df(rows: (Option[String], Long, Long)*): DataFrame =
      rows.toDF("k", "v", "ts")
    delta(path)(df((None, 1L, 10L), (Some("a"), 1L, 10L)), 0L) // v1
    delta(path)(df((None, 2L, 20L)), 1L)                       // v2
    val (feed, paths) = recordingPaths {
      KeyedUpsertSink.readChangesWeighted(spark, path, keys, order,
        fromVersion = 1L)
        .select("k", "v", "ts", "__weight")
        .as[(Option[String], Long, Long, Long)].collect().toSet
    }
    assert(paths == Seq("append"))
    assert(feed == Set((None, 2L, 20L, 1L), (None, 1L, 10L, -1L)))
  }

  test("change feed: the append fast path aligns schema evolution in both directions") {
    val path = newTable("graft-feed-evo")
    delta(path)(batchDf(("a", 1L, 10L), ("b", 1L, 10L)), 0L) // v1
    // v2 ADDS a column; the -1 image must null-fill it, the +1 carry it
    delta(path)(Seq(("a", 2L, 20L, "x")).toDF("k", "v", "ts", "tag"), 1L)
    val (feed, paths) = recordingPaths {
      KeyedUpsertSink.readChangesWeighted(spark, path, keys, order,
        fromVersion = 1L)
        .select("k", "v", "ts", "tag", "__weight")
        .as[(String, Long, Long, Option[String], Long)].collect().toSet
    }
    assert(paths == Seq("append"))
    assert(feed == Set(("a", 2L, 20L, Some("x"), 1L),
      ("a", 1L, 10L, None, -1L)))
  }

  test("streaming wiring: foreachBatch delta appends across restarts equal the batch LWW") {
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(spark, Sf0001).select(col("user_id"),
      col("event_id"), col("ts_us"))
    val k = Seq("user_id")
    val o = Seq(col("ts_us"), col("event_id"))
    val root = Files.createTempDirectory("graft-delta-stream")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val tbl = root.resolve("t").toString
    val ckpt = root.resolve("ckpt").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("recursiveFileLookup", "true").parquet(landing)
      val q = stream.writeStream
        .foreachBatch((df: DataFrame, id: Long) => {
          KeyedUpsertSink.upsertBucketedDelta(
            spark, tbl, k, o, numBuckets = 8, compactAfter = 4)(df, id); ()
        })
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // wave 0 → stop (restart boundary) → wave 1 under the SAME checkpoint
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$landing/w0")
    runOnce()
    ev.filter(col("event_id") % 2 === 1).write.parquet(s"$landing/w1")
    runOnce()
    def got: Set[(Long, Long, Long)] =
      KeyedUpsertSink.readBucketedDelta(spark, tbl, k, o)
        .select("user_id", "event_id", "ts_us")
        .as[(Long, Long, Long)].collect().toSet
    val want = KeyedUpsertSink.latestByKey(ev, k, o)
      .select("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // at-least-once redelivery: a FRESH checkpoint replays the entire
    // landing dir into the same table — the read must not change
    val versionsBefore = KeyedUpsertSink.tableVersions(tbl).max
    val root2 = Files.createTempDirectory("graft-delta-stream-ckpt2")
    val stream = spark.readStream.schema(ev.schema)
      .option("recursiveFileLookup", "true").parquet(landing)
    val q = stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) => {
        KeyedUpsertSink.upsertBucketedDelta(
          spark, tbl, k, o, numBuckets = 8, compactAfter = 4)(df, id); ()
      })
      .option("checkpointLocation", root2.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(KeyedUpsertSink.tableVersions(tbl).max > versionsBefore,
      "the replay must really have committed new deltas")
    assert(got == want, "full-stream redelivery must be a read-level no-op")
  }

  test("a batch missing a key or order column is refused before the merge can null-fill it") {
    val path = newTable("graft-delta-guard")
    delta(path)(batchDf(("a", 1L, 10L)), 0L)
    // missing ORDER column ts: null-filled it would lose every LWW
    // comparison — a silent stale no-op upsert
    val err = intercept[IllegalArgumentException] {
      delta(path)(Seq(("a", 2L)).toDF("k", "v"), 1L)
    }
    assert(err.getMessage.contains("missing key/order column(s) ts"))
    // missing KEY column: every batch row would collapse into one
    // null-key group
    val err2 = intercept[IllegalArgumentException] {
      delta(path)(Seq((2L, 20L)).toDF("v", "ts"), 2L)
    }
    assert(err2.getMessage.contains("missing key/order column(s) k"))
    // composite order expressions contribute EVERY referenced attribute
    val err3 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.upsertBucketedDelta(spark, path, Seq("k"),
        Seq(col("ts") + col("seq")))(Seq(("a", 30L)).toDF("k", "ts"), 3L)
    }
    assert(err3.getMessage.contains("missing key/order column(s) seq"))
    // an order Column built from a RESOLVED attribute (df("ts")) is
    // guarded too, not just unresolved col("ts") references
    val src = batchDf(("a", 3L, 30L))
    val err4 = intercept[IllegalArgumentException] {
      KeyedUpsertSink.upsertBucketedDelta(spark, path, Seq("k"),
        Seq(src("ts")))(Seq(("a", 4L)).toDF("k", "v"), 4L)
    }
    assert(err4.getMessage.contains("missing key/order column(s) ts"))
    assert(table(path) == Set(("a", 1L, 10L)), "a refused batch must change nothing")
  }

  test("a nested-struct order spec demands the TOP-LEVEL column, not the leaf field") {
    val path = newTable("graft-delta-nested")
    val nested = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 5L))
      .toDF("k", "v", "ts0")
      .select(col("k"), col("v"), struct(col("ts0").as("ts")).as("payload"))
    val sink = KeyedUpsertSink.upsertBucketedDelta(
      spark, path, Seq("k"), Seq(col("payload.ts")), 4) _
    sink(nested, 0L)
    val got = KeyedUpsertSink.readBucketedDelta(
      spark, path, Seq("k"), Seq(col("payload.ts")))
      .select(col("k"), col("v"), col("payload.ts").as("ts"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 20L), ("b", 1L, 5L)))
    // a batch with a stray TOP-LEVEL ts but no payload struct must be
    // refused for the missing `payload` — naming the leaf field would
    // pass this batch, null-fill payload, and silently lose every LWW
    // comparison (the corruption the guard exists to prevent)
    val err = intercept[IllegalArgumentException] {
      sink(Seq(("a", 9L, 99L)).toDF("k", "v", "ts"), 1L)
    }
    assert(err.getMessage.contains("missing key/order column(s) payload"))
  }

  test("a failed best-effort auto-compaction never fails a durably-committed batch") {
    val path = newTable("graft-delta-bestderr")
    val sink = delta(path, numBuckets = 1) _
    val gens = (0L to 2L).map(i => sink(batchDf((s"k$i", i, 10L + i)), i).gen)
    assert(chainLens(path) == Map(0L -> 3))
    // sabotage the fold: reclaim a REFERENCED generation dir (the shape a
    // concurrent vacuum race produces) so compaction's read blows up
    val victim = Paths.get(path, gens.head)
    val walk = Files.walk(victim)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walk.close()
    // the next delta batch crosses compactAfter → auto-compaction fires
    // and FAILS — but the batch's own commit is already durable, so the
    // sink must return its stats, not throw
    val st = KeyedUpsertSink.upsertBucketedDelta(
      spark, path, keys, order, numBuckets = 1, compactAfter = 3)(
      batchDf(("k3", 3L, 13L)), 3L)
      .getOrElse(fail("batch must commit despite the failed compaction"))
    assert(st.version == 4L)
    // chain left long for a later (healed) trigger — not folded, not torn
    assert(chainLens(path) == Map(0L -> 4))
  }
}
