package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sink.{KeyedUpsertSink, MaterializedAggView}
import graft.sink.MaterializedAggView.{AggCol, DistinctCol, ExtremumCol}

/** Streaming view maintenance ([[MaterializedAggView.maintainStream]]):
  * the view follows the base table through the `graft-changes` weighted
  * stream — foreachBatch folds anchored on the batch's version columns,
  * the CAS publish as the exactly-once commit. Pinned here: streamed
  * maintenance equals batch refreshes (and the from-scratch recompute)
  * across multi-wave commits, a restart resumes from the watermark, a
  * publish-then-crash replay is skipped (not double-folded), and a
  * manual refresh racing the stream loses loudly.
  */
class StreamingViewSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private def order = Seq(col("ts"))
  private val dims = Seq("d")
  private val aggs = Seq(AggCol("n", lit(1L)), AggCol("sum_v", col("v")))
  private val ext = Seq(
    ExtremumCol("min_v", col("v"), isMin = true),
    ExtremumCol("max_v", col("v"), isMin = false))
  private val nd = Seq(DistinctCol("nd_v", col("v") % 10L))

  private def batchDf(rows: (String, String, Long, Long)*): DataFrame =
    rows.toDF("k", "d", "v", "ts")

  private def sink(path: String) = KeyedUpsertSink.upsertBucketedDelta(
    spark, path, keys, order, numBuckets = 4, compactAfter = 0) _

  private def recompute(base: String): Set[(String, Long, Long, Long, Long, Long)] =
    KeyedUpsertSink.readBucketedDelta(spark, base, keys, order)
      .groupBy("d").agg(
        count(lit(1L)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"),
        count_distinct(col("v") % 10L).as("nd_v"))
      .select("d", "n", "sum_v", "min_v", "max_v", "nd_v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  private def viewRows(viewPath: String): Set[(String, Long, Long, Long, Long, Long)] =
    MaterializedAggView.read(spark, viewPath)
      .select("d", "n", "sum_v", "min_v", "max_v", "nd_v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  private def stream(base: String, view: String, ckpt: String): Unit = {
    val q = MaterializedAggView.maintainStream(spark, base, view, keys,
      order, dims, aggs, ext, nd, checkpointDir = ckpt)
    q.awaitTermination()
  }

  test("streamed maintenance equals the recompute across multi-wave commits, and a restart resumes") {
    val root = Files.createTempDirectory("graft-mvs")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L), ("b", "x", 7L, 10L), ("c", "y", 1L, 10L)), 0L)
    // twin views bootstrapped at the same watermark: `view` is streamed,
    // `view2` manually refreshed — the fold-parity control
    val view2 = root.resolve("view2").toString
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    MaterializedAggView.bootstrap(spark, base, view2, keys, order, dims,
      aggs, ext, nd)
    def refresh2(): Unit = {
      MaterializedAggView.refresh(spark, base, view2, keys, order, dims,
        aggs, ext, nd); ()
    }
    // two waves: an update MOVES a key between groups (retraction), an
    // insert lands, and a redelivery nets nothing
    up(batchDf(("a", "y", 9L, 20L), ("d", "x", 3L, 20L)), 1L)
    refresh2() // per-wave manual refreshes on the control view
    up(batchDf(("a", "y", 9L, 20L), ("e", "y", 5L, 30L)), 2L) // redelivery + insert
    refresh2()
    stream(base, view, ckpt)
    assert(viewRows(view) == recompute(base))
    assert(viewRows(view) == viewRows(view2),
      "streamed maintenance must equal per-wave manual refreshes")
    assert(MaterializedAggView.watermark(view).contains(
      KeyedUpsertSink.tableVersions(base).max))
    // more commits land; the SAME checkpoint resumes and catches up
    up(batchDf(("b", "y", 2L, 40L)), 3L)           // b moves x -> y
    up(batchDf(("f", "x", 11L, 50L)), 4L)
    refresh2()
    stream(base, view, ckpt)
    assert(viewRows(view) == recompute(base))
    assert(viewRows(view) == viewRows(view2))
  }

  test("bounded catch-up: maxVersionsPerTrigger folds the backlog in capped anchored batches") {
    val root = Files.createTempDirectory("graft-mvs-cap")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L)), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    // a 5-version backlog accrues while the maintainer is down
    (1 to 5).foreach { i =>
      up(batchDf((s"k$i", if (i % 2 == 0) "x" else "y", i.toLong, 10L + i)), i.toLong)
    }
    val folds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val old = MaterializedAggView.onAfterStreamFold
    MaterializedAggView.onAfterStreamFold = folds += _
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt,
        maxVersionsPerTrigger = Some(2L))
      q.awaitTermination()
    } finally MaterializedAggView.onAfterStreamFold = old
    // ceil(5/2) = 3 anchored folds, watermarks strictly ascending to
    // the head, each batch ≤ 2 versions
    assert(folds.toSeq == folds.sorted.distinct.toSeq, s"folds: $folds")
    assert(folds.size == 3, s"expected 3 capped folds, got $folds")
    assert(folds.last == KeyedUpsertSink.tableVersions(base).max)
    assert(MaterializedAggView.watermark(view) == Some(folds.last))
    assert(viewRows(view) == recompute(base))
  }

  test("a publish-then-crash replay is skipped, never double-folded") {
    val root = Files.createTempDirectory("graft-mvs-crash")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L)), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    up(batchDf(("b", "x", 7L, 20L)), 1L)
    // crash AFTER the fold published, BEFORE the checkpoint commits —
    // the exactly-once window the anchored skip absorbs
    MaterializedAggView.onAfterStreamFold = _ =>
      throw new RuntimeException("injected crash after publish")
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt)
      intercept[Throwable] { q.awaitTermination() }
    } finally MaterializedAggView.onAfterStreamFold = _ => ()
    // the fold DID publish
    assert(viewRows(view) == recompute(base))
    // restart: the engine replays the uncommitted batch; the anchored
    // skip must absorb it (a double fold would double n/sum_v)
    stream(base, view, ckpt)
    assert(viewRows(view) == recompute(base))
  }

  test("a force re-bootstrap below the checkpoint's floor refuses the old checkpoint loudly") {
    // the silent-wrong-data hole the final review sweep found: force a
    // view onto a recreated base (watermark moves BACKWARD), then
    // restart the maintenance stream on the OLD checkpoint — without
    // the guard it would resume at the old history's offsets and fold
    // only the tail of the new history (under-counted aggregates, no
    // error)
    val root = Files.createTempDirectory("graft-mvs-floor")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L)), 0L)
    up(batchDf(("b", "x", 7L, 20L)), 1L)
    up(batchDf(("c", "y", 1L, 30L)), 2L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    stream(base, view, ckpt) // persists the floor (v3) under the checkpoint
    // the base is recreated with a shorter history; the view is
    // deliberately re-bootstrapped onto it
    val s0 = Files.walk(java.nio.file.Paths.get(base))
    try s0.sorted(java.util.Comparator.reverseOrder()).iterator()
      .forEachRemaining(p => { Files.deleteIfExists(p); () })
    finally s0.close()
    up(batchDf(("z", "z", 9L, 90L)), 0L) // new history: head v1
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd, force = true)
    up(batchDf(("w", "z", 4L, 95L)), 1L) // new history grows to v2
    val err = intercept[IllegalStateException] {
      MaterializedAggView.maintainStream(spark, base, view, keys, order,
        dims, aggs, ext, nd, checkpointDir = ckpt)
    }
    assert(err.getMessage.contains("persisted stream floor"))
    assert(err.getMessage.contains("FRESH checkpoint"))
    // the documented recovery — a fresh checkpoint — catches up correctly
    stream(base, view, root.resolve("ckpt2").toString)
    assert(viewRows(view) == recompute(base))
  }

  test("a manual refresh racing the maintenance stream loses loudly") {
    val root = Files.createTempDirectory("graft-mvs-race")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L)), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    up(batchDf(("b", "x", 7L, 20L)), 1L)
    stream(base, view, ckpt) // stream owns (v1, v2]
    // a manual refresh sneaks in between stream runs and advances the
    // watermark over (v2, v3]...
    up(batchDf(("c", "y", 1L, 30L)), 2L)
    MaterializedAggView.refresh(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    // ...so the stream's next batch (v2, v4] STRADDLES the watermark
    // (v3): folding it would double-count (v2, v3] — loud, not wrong
    up(batchDf(("d", "y", 2L, 40L)), 3L)
    val q = MaterializedAggView.maintainStream(spark, base, view, keys,
      order, dims, aggs, ext, nd, checkpointDir = ckpt)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"expected ConcurrentModificationException in: ${chain(err).map(_.getClass.getName)}")
    assert(chain(err).exists(c => Option(c.getMessage)
      .exists(_.contains("another maintainer advanced the view mid-range"))))
    // the view itself is UNDAMAGED — still exactly the manual refresh's
    // state (watermark v3), never a double fold
    assert(MaterializedAggView.watermark(view).contains(3L))
  }
}
