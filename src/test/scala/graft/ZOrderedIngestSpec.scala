package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.analytics.ZOrderedIngest

/** Streaming z-order ingest: content always equals the ingested union,
  * compaction fires on cadence and swaps atomically, replay is
  * idempotent, the clustered files still prune both filter dimensions —
  * and compaction is INCREMENTAL: disjoint-z appends carry the old
  * files over by reference (zero bytes rewritten), overlapping appends
  * rewrite only the touched envelope, and the crash window between
  * manifest swap and vacuum never double-counts rows.
  */
class ZOrderedIngestSpec extends SparkSpec {

  private def mkRows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id").as("event_id"),
      (col("id") % 300).as("user_id"),
      (lit(473352L) + (col("id") / 300).cast("long") % 720).as("hour"),
      md5(col("id").cast("string")).as("payload"))

  // rows confined to one z quadrant: both coords in [base, base+span)
  private def quad(lo: Long, hi: Long, base: Long, span: Long) =
    spark.range(lo, hi).select(
      col("id").as("event_id"),
      (lit(base) + col("id") % span).as("user_id"),
      (lit(base) + (col("id") / span).cast("long") % span).as("hour"),
      md5(col("id").cast("string")).as("payload"))

  test("streamed ingest equals the union; compaction consumes deltas") {
    val dir = Files.createTempDirectory("graft-zing").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 8, 3) _
    ingest(mkRows(0, 20000), 0L)
    ingest(mkRows(20000, 40000), 1L)
    val (files1, deltas1, _) = ZOrderedIngest.state(dir)
    assert(files1.isEmpty && deltas1.size == 2, "no compaction before cadence")
    ingest(mkRows(40000, 60000), 2L) // 3rd delta → compaction
    val (files2, deltas2, upto2) = ZOrderedIngest.state(dir)
    assert(files2.nonEmpty && deltas2.isEmpty, s"$files2 $deltas2")
    assert(upto2 == 2L)
    assert(files2.map(_.rows).sum == 60000, "manifest row stats must cover the table")
    ingest(mkRows(60000, 70000), 3L) // fresh delta atop the clustered part
    val got = ZOrderedIngest.read(spark, dir)
    assert(got.count() == 70000)
    assert(got.unionByName(mkRows(0, 70000)).distinct().count() == 70000,
      "ingested content diverged from the union")
  }

  test("batch replay is idempotent, including a replay after its own compaction") {
    val dir = Files.createTempDirectory("graft-zing-replay").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 8, 2) _
    ingest(mkRows(0, 10000), 0L)
    ingest(mkRows(0, 10000), 0L) // plain redelivery before compaction
    ingest(mkRows(10000, 20000), 1L) // compacts → clustered files
    // redelivery AFTER the compaction consumed the delta (crash between
    // compaction and checkpoint commit): the watermark makes it a no-op
    ingest(mkRows(10000, 20000), 1L)
    val got = ZOrderedIngest.read(spark, dir)
    assert(got.count() == 20000, "replay must not duplicate rows")
    val (files, deltas, upto) = ZOrderedIngest.state(dir)
    assert(files.nonEmpty && deltas.isEmpty && upto == 1L)
  }

  test("the clustered files prune both dimensions under a 2-D filter") {
    val dir = Files.createTempDirectory("graft-zing-prune").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 32, 1) _
    ingest(mkRows(0, 200000), 0L) // immediate compaction
    val (files, deltas, _) = ZOrderedIngest.state(dir)
    assert(files.nonEmpty && deltas.isEmpty)
    val filtered = ZOrderedIngest.read(spark, dir)
      .filter(col("user_id").between(10, 20) && col("hour").between(473400L, 473420L))
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("user_id") && pushed.contains("hour"),
      s"both dimensions must push down: $pushed")
    assert(filtered.count() ==
      mkRows(0, 200000).filter(col("user_id").between(10, 20)
        && col("hour").between(473400L, 473420L)).count())
  }

  test("disjoint-z append rewrites nothing; overlap rewrites only its envelope") {
    val dir = Files.createTempDirectory("graft-zing-incr").toString
    val root = Paths.get(dir)
    def fileSize(rel: String): Long = Files.size(root.resolve(rel))
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 8, 1) _
    // wave 1: quadrant [0,256)² → 8 clustered files
    ingest(quad(0, 60000, 0, 256), 0L)
    val (files1, _, _) = ZOrderedIngest.state(dir)
    assert(files1.size >= 2)
    val sizes1 = files1.map(f => f.path -> fileSize(f.path)).toMap
    // wave 2: quadrant [1024,1280)² — z-disjoint (higher interleaved
    // bits) → ZERO wave-1 files touched, all carried over by reference
    ingest(quad(60000, 90000, 1024, 256), 1L)
    val (files2, _, _) = ZOrderedIngest.state(dir)
    val carried = files2.map(_.path).toSet intersect files1.map(_.path).toSet
    assert(carried == files1.map(_.path).toSet,
      s"disjoint append must not rewrite: kept ${carried.size}/${files1.size}")
    carried.foreach { p =>
      assert(fileSize(p) == sizes1(p), s"carried file $p changed on disk")
    }
    assert(ZOrderedIngest.read(spark, dir).count() == 90000)
    // wave 3: inside wave-2's quadrant → touches (some of) wave 2's
    // files, never wave 1's
    ingest(quad(90000, 100000, 1024, 256), 2L)
    val (files3, _, _) = ZOrderedIngest.state(dir)
    assert(files1.map(_.path).toSet.subsetOf(files3.map(_.path).toSet),
      "overlap confined to wave-2 envelope must leave wave-1 files alone")
    // probe-measure proportionality: bytes rewritten in wave 3 ≪ table
    val wave3New = files3.map(_.path).toSet -- files2.map(_.path).toSet
    val rewritten = wave3New.toSeq.map(fileSize).sum
    val table = files3.map(f => fileSize(f.path)).sum
    assert(rewritten < table / 2,
      s"rewrote $rewritten of $table bytes — not incremental")
    // and reads equal the full union regardless of layout history
    val want = quad(0, 60000, 0, 256).unionByName(quad(60000, 100000, 1024, 256))
    assert(ZOrderedIngest.read(spark, dir).count() == 100000)
    assert(ZOrderedIngest.read(spark, dir).unionByName(want)
      .distinct().count() == 100000, "content diverged after partial compactions")
  }

  test("fragmentation stays bounded: disjoint appends escalate to a full re-cluster") {
    val dir = Files.createTempDirectory("graft-zing-frag").toString
    // numFiles=2, cap=6: every compaction is a fresh z quadrant (never
    // touches old files), so the count climbs until escalation folds it
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 2, 1, 6) _
    val waves = 10
    var sawEscalation = false
    var peak = 0
    (0 until waves).foreach { i =>
      val before = ZOrderedIngest.state(dir)._1.map(_.path).toSet
      ingest(quad(i * 3000L, i * 3000L + 3000L, 4096L * (i + 1), 256), i.toLong)
      val after = ZOrderedIngest.state(dir)._1
      peak = math.max(peak, after.size)
      assert(after.size <= 6 + 2,
        s"wave $i: ${after.size} files — fragmentation unbounded")
      // escalation = a compaction that rewrote previously-untouchable
      // (z-disjoint) files: no old path survives it
      if (before.nonEmpty && after.map(_.path).toSet.intersect(before).isEmpty)
        sawEscalation = true
    }
    assert(sawEscalation, s"cap never triggered a full re-cluster (peak $peak)")
    assert(ZOrderedIngest.read(spark, dir).count() == waves * 3000L,
      "content diverged across escalations")
  }

  test("crash after swap, before vacuum: straggler deltas neither re-read nor re-fold") {
    val dir = Files.createTempDirectory("graft-zing-crash").toString
    val ingest = ZOrderedIngest.ingestBatch(spark, "user_id", "hour",
      dir, 4, 2) _
    ingest(mkRows(0, 5000), 0L)
    ingest(mkRows(5000, 10000), 1L) // compacts, upto=1
    // simulate the crash window: resurrect a consumed delta dir AFTER
    // the swap+vacuum (as if the process died between them)
    mkRows(5000, 10000).write.parquet(s"$dir/delta-1")
    // state() must exclude it (≤ upto) …
    val (_, deltas, upto) = ZOrderedIngest.state(dir)
    assert(upto == 1L && deltas.isEmpty, s"straggler leaked into state: $deltas")
    // … read() must not double-count …
    assert(ZOrderedIngest.read(spark, dir).count() == 10000)
    // … and the next ingest self-heals it away, then compacts cleanly
    ingest(mkRows(10000, 15000), 2L)
    ingest(mkRows(15000, 20000), 3L) // compacts, upto=3
    assert(!Files.exists(Paths.get(dir, "delta-1")), "self-heal vacuum skipped")
    assert(ZOrderedIngest.read(spark, dir).count() == 20000,
      "straggler rows must never re-fold")
  }
}
