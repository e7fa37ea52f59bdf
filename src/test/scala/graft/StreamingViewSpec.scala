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

  private def stream(base: String, view: String, ckpt: String,
      maxBuckets: Option[Long] = None): Unit = {
    val q = MaterializedAggView.maintainStream(spark, base, view, keys,
      order, dims, aggs, ext, nd, checkpointDir = ckpt,
      maxBucketsPerTrigger = maxBuckets)
    q.awaitTermination()
  }

  /** The from-scratch recompute over an EXPLICIT manifest — the audit
    * for a mid-version (mixed) state: applied buckets at the step
    * version, the rest still at the base version.
    */
  private def recomputeManifest(base: String,
      man: Map[Long, String]): Set[(String, Long, Long, Long, Long, Long)] =
    KeyedUpsertSink.readBucketedDeltaManifest(spark, base, keys, order, man)
      .groupBy("d").agg(
        count(lit(1L)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"),
        count_distinct(col("v") % 10L).as("nd_v"))
      .select("d", "n", "sum_v", "min_v", "max_v", "nd_v")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

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

  test("streamed maintenance folds DELETES: tombstoned keys leave groups, extrema re-derive, emptied groups vanish") {
    val root = Files.createTempDirectory("graft-mvs-del")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L), ("b", "x", 7L, 10L),
      ("c", "y", 1L, 10L)), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    // wave 1: DELETE the MAX-holder of group x and the only key of y —
    // the weighted stream delivers both as bare -1 retractions; the
    // extremum re-derives through the dirty path and y vanishes
    KeyedUpsertSink.deleteBucketedDelta(
      spark, base, keys, order, numBuckets = 4)(
      Seq(("b", 20L), ("c", 20L)).toDF("k", "ts"), 1L)
    stream(base, view, ckpt)
    assert(viewRows(view) == recompute(base))
    assert(viewRows(view) == Set(("x", 1L, 5L, 5L, 5L, 1L)),
      s"b's deletion must re-derive x's max and empty y: ${viewRows(view)}")
    // wave 2: a re-insert of the deleted key into ANOTHER group plus a
    // second delete — the SAME checkpoint resumes past both
    up(batchDf(("b", "y", 9L, 30L)), 2L)
    KeyedUpsertSink.deleteBucketedDelta(
      spark, base, keys, order, numBuckets = 4)(
      Seq(("a", 40L)).toDF("k", "ts"), 3L)
    stream(base, view, ckpt)
    assert(viewRows(view) == recompute(base))
    assert(viewRows(view) == Set(("y", 1L, 9L, 9L, 9L, 1L)),
      s"x must empty after a's deletion; b returns in y: ${viewRows(view)}")
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
    // the checkpointDir is passed in URI form here on purpose: the
    // guard must resolve it through the source's ONE path rule (a raw
    // Paths.get on "file:/..." probes a nonexistent relative path and
    // silently DISARMS the guard — a review finding)
    val err = intercept[IllegalStateException] {
      MaterializedAggView.maintainStream(spark, base, view, keys, order,
        dims, aggs, ext, nd, checkpointDir = s"file:$ckpt")
    }
    assert(err.getMessage.contains("persisted stream floor"))
    assert(err.getMessage.contains("FRESH checkpoint"))
    // the documented recovery — a fresh checkpoint — catches up correctly
    stream(base, view, root.resolve("ckpt2").toString)
    assert(viewRows(view) == recompute(base))
  }

  test("a force re-bootstrap AT-OR-ABOVE the old floor still refuses the old checkpoint (incarnation guard)") {
    // the hole the floor comparison cannot see: the checkpoint's floor
    // is the view's ORIGINAL (low) bootstrap watermark, so a recreated
    // base whose new head clears it passes every version check — while
    // the checkpoint's OFFSETS still index the OLD history. Only the
    // incarnation token (replaced by every force) can tell them apart.
    val root = Files.createTempDirectory("graft-mvs-incarnation")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(batchDf(("a", "x", 5L, 10L)), 0L) // v1
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    stream(base, view, ckpt) // binds the checkpoint: floor v1, incarnation
    // the stream runs far ahead of the floor
    (1 to 4).foreach(i => up(batchDf((s"k$i", "x", i.toLong, 20L + i)), i.toLong))
    stream(base, view, ckpt) // offsets now at v5, watermark v5
    // the base is recreated with a SHORTER history whose head (v3)
    // still clears the checkpoint's floor (v1)
    val s0 = Files.walk(java.nio.file.Paths.get(base))
    try s0.sorted(java.util.Comparator.reverseOrder()).iterator()
      .forEachRemaining(p => { Files.deleteIfExists(p); () })
    finally s0.close()
    up(batchDf(("z", "z", 9L, 90L)), 0L)  // new history v1
    up(batchDf(("y", "z", 8L, 91L)), 1L)  // v2
    up(batchDf(("w", "z", 4L, 92L)), 2L)  // v3 ≥ the old floor
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd, force = true)
    val err = intercept[IllegalStateException] {
      MaterializedAggView.maintainStream(spark, base, view, keys, order,
        dims, aggs, ext, nd, checkpointDir = ckpt)
    }
    assert(err.getMessage.contains("incarnation"))
    assert(err.getMessage.contains("FRESH checkpoint"))
    // the documented recovery — a fresh checkpoint — tracks correctly
    up(batchDf(("v", "z", 2L, 93L)), 3L) // v4
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

  /** A fat commit touching every bucket of the 4-bucket layout. */
  private def fatBatch(tag: Long): DataFrame =
    batchDf((1 to 16).map(i =>
      (s"k$i", if (i % 2 == 0) "x" else "y", 100L * tag + i, 10L * tag)): _*)

  test("sliced streamed maintenance: a fat commit drains in bucket slices; every mid-version state is the mixed base") {
    val root = Files.createTempDirectory("graft-mvs-slice")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    up(fatBatch(1L), 0L) // v1: seeds all 4 buckets
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    up(fatBatch(2L), 1L) // v2: rewrites every key (touches all 4 buckets)
    val touched = KeyedUpsertSink.touchedBucketsAt(base, 2L).get
    assert(touched.size == 4, s"fixture must touch all 4 buckets: $touched")
    // crash the stream after its FIRST fold — a mid-version slice
    var folds = 0
    MaterializedAggView.onAfterStreamFold = _ => {
      folds += 1
      if (folds == 1) throw new RuntimeException("injected crash mid-drain")
    }
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt,
        maxBucketsPerTrigger = Some(1L))
      intercept[Throwable] { q.awaitTermination() }
    } finally MaterializedAggView.onAfterStreamFold = _ => ()
    // the crash landed after a MID-VERSION publish: the watermark is the
    // cursor position, and the stored view equals the recompute over the
    // MIXED manifest — the first slice's bucket at v2, the rest at v1
    assert(MaterializedAggView.watermarkFull(view) == Some((1L, 1L)))
    val mixed = KeyedUpsertSink.mixedManifestAt(base, 1L,
      touched.take(1).toSet)
    assert(viewRows(view) == recomputeManifest(base, mixed),
      "the mid-version view must equal the mixed-state recompute")
    assert(viewRows(view) != recompute(base),
      "fixture must distinguish the mixed state from the final state")
    // the SAME checkpoint resumes: the crashed slice replays (skipped at
    // the watermark), the remaining slices fold, the final state is the
    // whole-table recompute at the head
    stream(base, view, ckpt, maxBuckets = Some(1L))
    assert(MaterializedAggView.watermarkFull(view) == Some((2L, 0L)))
    assert(viewRows(view) == recompute(base))
  }

  test("a mid-version dirty-extremum recompute reads the MIXED state, never an unapplied bucket's future value") {
    val root = Files.createTempDirectory("graft-mvs-mixed-ext")
    // learn each key's bucket on a scratch table with the same layout
    // (bucket assignment is a pure function of key and bucket count):
    // one single-key commit per key, touchedBucketsAt names its bucket
    val probe = root.resolve("probe").toString
    val upProbe = sink(probe)
    val bucketOf = (1 to 8).map { i =>
      upProbe(batchDf((s"k$i", "g", 0L, 1L)), (i - 1).toLong)
      s"k$i" -> KeyedUpsertSink.touchedBucketsAt(probe, i.toLong).get.head
    }.toMap
    // two keys in DISTINCT buckets, kA's strictly first in slice order
    val sorted = bucketOf.toSeq.sortBy(_._2)
    val kA = sorted.head._1
    val kB = sorted.find(_._2 > bucketOf(kA)).map(_._1).getOrElse(
      fail("fixture needs keys in at least two distinct buckets"))
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up = sink(base)
    // v1: kA holds the group min (40); kB sits at 60; everyone else 70+
    up(batchDf((1 to 8).map { i =>
      val k = s"k$i"
      val v = if (k == kA) 40L else if (k == kB) 60L else 70L + i
      (k, "g", v, 10L)
    }: _*), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    // v2: kA's update RETRACTS the stored min (40 -> 55, dirties the
    // group); kB — in a LATER bucket, so an UNAPPLIED slice — drops to
    // the future global min 1
    up(batchDf((kA, "g", 55L, 20L), (kB, "g", 1L, 20L)), 1L)
    assert(KeyedUpsertSink.touchedBucketsAt(base, 2L).get ==
      Seq(bucketOf(kA), bucketOf(kB)).sorted)
    var folds = 0
    MaterializedAggView.onAfterStreamFold = _ => {
      folds += 1
      if (folds == 1) throw new RuntimeException("injected crash mid-drain")
    }
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt,
        maxBucketsPerTrigger = Some(1L))
      intercept[Throwable] { q.awaitTermination() }
    } finally MaterializedAggView.onAfterStreamFold = _ => ()
    assert(MaterializedAggView.watermarkFull(view) == Some((1L, 1L)))
    // the dirty recompute ran against the MIXED manifest: kA at 55, kB
    // still at its OLD 60 — min 55. A recompute that read v2 plain would
    // leak kB's unapplied 1 into an extremum the sums don't reflect yet.
    val mid = viewRows(view)
    assert(mid.map(_._4).min == 55L,
      s"mid-version min must be the mixed state's 55, got: $mid")
    // draining the rest lands the true final state (min 1)
    stream(base, view, ckpt, maxBuckets = Some(1L))
    assert(viewRows(view) == recompute(base))
    assert(viewRows(view).map(_._4).min == 1L)
  }

  test("a mid-version watermark recovers on a FRESH checkpoint through the cursor floor") {
    val root = Files.createTempDirectory("graft-mvs-cursor-floor")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val up = sink(base)
    up(fatBatch(1L), 0L)
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    up(fatBatch(2L), 1L)
    var folds = 0
    MaterializedAggView.onAfterStreamFold = _ => {
      folds += 1
      if (folds == 1) throw new RuntimeException("injected crash mid-drain")
    }
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd,
        checkpointDir = root.resolve("ckpt-lost").toString,
        maxBucketsPerTrigger = Some(1L))
      intercept[Throwable] { q.awaitTermination() }
    } finally MaterializedAggView.onAfterStreamFold = _ => ()
    assert(MaterializedAggView.watermarkFull(view) == Some((1L, 1L)))
    // the checkpoint is LOST (deleted); a fresh stream starts from the
    // view's mid-version watermark via the cursor-offset floor and
    // drains exactly the remainder
    stream(base, view, root.resolve("ckpt-new").toString,
      maxBuckets = Some(1L))
    assert(MaterializedAggView.watermarkFull(view) == Some((2L, 0L)))
    assert(viewRows(view) == recompute(base))
  }

  test("sliced streamed maintenance crosses an online rebucket: the resize version drains whole, slicing resumes under the new layout") {
    val root = Files.createTempDirectory("graft-mvs-rebucket")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    val up4 = sink(base) // 4-bucket layout
    up4(fatBatch(1L), 0L) // v1
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    up4(fatBatch(2L), 1L) // v2: slices under the OLD layout
    KeyedUpsertSink.rebucketTable(spark, base, keys, order, 8) // v3
    assert(KeyedUpsertSink.touchedBucketsAt(base, 3L).isEmpty,
      "the resize version must report unsplittable")
    // v4: every key rewritten under the NEW 8-bucket layout — each
    // slice non-empty, so the drain ends on a clean boundary
    KeyedUpsertSink.upsertBucketedDelta(spark, base, keys, order,
      numBuckets = 8, compactAfter = 0)(fatBatch(3L), 2L) // v4
    stream(base, view, ckpt, maxBuckets = Some(1L))
    // the rebucket version's feed is a row-level no-op (full-diff path,
    // empty), v4's slices fold under the new layout's touched list, and
    // the final state equals the recompute at the head
    assert(MaterializedAggView.watermarkFull(view) == Some((4L, 0L)))
    assert(viewRows(view) == recompute(base))
  }

  test("a trailing EMPTY slice leaves a mid-version watermark; a manual refresh is the unstick") {
    // the stuck corner: a version's last slice has an empty resolved
    // feed (a redelivery — the chain changed, the image didn't), so the
    // drain's offsets pass it but the watermark cannot (an empty batch
    // carries no anchor rows to publish from). Until the next upstream
    // commit, nothing advances the view — refresh() must fold the
    // remainder and publish clean at the head.
    val root = Files.createTempDirectory("graft-mvs-stuck")
    val base = root.resolve("t").toString
    val view = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString
    // learn two keys in distinct buckets (same probe as the mixed test)
    val probe = root.resolve("probe").toString
    val upProbe = sink(probe)
    val bucketOf = (1 to 8).map { i =>
      upProbe(batchDf((s"k$i", "g", 0L, 1L)), (i - 1).toLong)
      s"k$i" -> KeyedUpsertSink.touchedBucketsAt(probe, i.toLong).get.head
    }.toMap
    val sorted = bucketOf.toSeq.sortBy(_._2)
    val kA = sorted.head._1
    val kB = sorted.find(_._2 > bucketOf(kA)).map(_._1).getOrElse(
      fail("fixture needs keys in at least two distinct buckets"))
    val up = sink(base)
    up(batchDf((kA, "g", 5L, 10L), (kB, "g", 7L, 10L)), 0L) // v1
    MaterializedAggView.bootstrap(spark, base, view, keys, order, dims,
      aggs, ext, nd)
    // v2: kA really changes (earlier bucket, non-empty slice); kB is a
    // REDELIVERY (identical row — chain grows, resolved image does not,
    // so its later slice's feed is empty)
    up(batchDf((kA, "g", 9L, 20L), (kB, "g", 7L, 10L)), 1L)
    assert(KeyedUpsertSink.touchedBucketsAt(base, 2L).get ==
      Seq(bucketOf(kA), bucketOf(kB)).sorted)
    stream(base, view, ckpt, maxBuckets = Some(1L)) // full drain, no crash
    // ...and the drain ends STUCK mid-version: offsets at the head, the
    // watermark one empty slice behind
    assert(MaterializedAggView.watermarkFull(view) == Some((1L, 1L)),
      "the trailing empty slice must leave the watermark mid-version")
    // content is nonetheless correct for the mixed position == the head
    // state here (the empty slice changed nothing)
    assert(viewRows(view) == recompute(base))
    // restarting the same checkpoint cannot advance it (no new batches)
    stream(base, view, ckpt, maxBuckets = Some(1L))
    assert(MaterializedAggView.watermarkFull(view) == Some((1L, 1L)))
    // the unstick: one manual refresh folds the (empty) remainder and
    // publishes clean at the head
    assert(MaterializedAggView.refresh(spark, base, view, keys, order,
      dims, aggs, ext, nd).contains((1L, 2L)))
    assert(MaterializedAggView.watermarkFull(view) == Some((2L, 0L)))
    assert(viewRows(view) == recompute(base))
    // the remainder+tail path: stick it again with MORE history on top
    up(batchDf((kA, "g", 11L, 30L), (kB, "g", 7L, 10L)), 2L) // v3: same shape
    up(batchDf((kB, "g", 1L, 40L)), 3L)                      // v4: tail
    var folds = 0
    MaterializedAggView.onAfterStreamFold = _ => {
      folds += 1
      if (folds == 1) throw new RuntimeException("injected crash mid-drain")
    }
    try {
      val q = MaterializedAggView.maintainStream(spark, base, view, keys,
        order, dims, aggs, ext, nd,
        checkpointDir = root.resolve("ckpt2").toString,
        maxBucketsPerTrigger = Some(1L))
      intercept[Throwable] { q.awaitTermination() }
    } finally MaterializedAggView.onAfterStreamFold = _ => ()
    assert(MaterializedAggView.watermarkFull(view) == Some((2L, 1L)))
    // refresh folds the v3 remainder PLUS the (v3, v4] tail in one pass
    assert(MaterializedAggView.refresh(spark, base, view, keys, order,
      dims, aggs, ext, nd).contains((2L, 4L)))
    assert(MaterializedAggView.watermarkFull(view) == Some((4L, 0L)))
    assert(viewRows(view) == recompute(base))
  }
}
