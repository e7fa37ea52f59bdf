package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{GraphAnalytics, Queries}
import graft.dedup.Dedup
import graft.events.EventAnalytics
import graft.ingest.CsvExtract
import graft.model.Model
import graft.multimodal.Multimodal
import graft.pipeline.EtlPipeline
import graft.route.Rules
import graft.sample.Sampling
import graft.sim.Similarity
import graft.sink.{AuditSink, KeyedUpsertSink}
import graft.text.TextAnalysis
import graft.xform.Transform

/** Driver contract (SURVEY.md §7): one `queries` entry per implemented
  * operator from SURVEY.md §2 plus the north-star extensions, and a DuckDB
  * oracle for every SQL-expressible one.
  *
  * Cross-engine parity rules used throughout (discovered the hard way):
  *  - DuckDB reads parquet TIMESTAMP(NANOS) truncated to µs → all
  *    event-time ordering/arithmetic uses `ts_us` on both sides;
  *  - sums go through decimal(18,6) BEFORE aggregation (exact, engine-
  *    independent) and final agg columns are cast to an explicit
  *    decimal(38,6) so output schemas match;
  *  - counts/lengths/ranks are BIGINT on both sides (DuckDB len()/count()
  *    are BIGINT; Spark length()/size()/row_number() are int → cast);
  *  - every computed column is aliased identically in Spark and SQL.
  */
object SparkEntry {

  /** The reference's own fixture, replayed through the full pipeline —
    * the behavioral golden test the reference implies but never wrote
    * (SURVEY.md §5.2.4).
    */
  val AddressCsv = "/root/reference/data-to-upload/address.csv"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** The `customer` table re-cast to all-strings: the stand-in for a large
    * CSV landing in the ETL pipeline (the reference types nothing —
    * SURVEY.md §1.2 — so "a CSV at scale" IS an all-string table).
    * Doubles are excluded: double→string formatting is engine-specific.
    */
  private def customerAsCsv(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").cast("string").as("c_custkey"),
      col("c_name").as("c_name"),
      col("c_nationkey").cast("string").as("c_nationkey"),
      col("c_mktsegment").as("c_mktsegment"))

  private val customerRenames: Seq[(String, String)] = Seq(
    "c_custkey" -> "id", "c_name" -> "name",
    "c_nationkey" -> "nation", "c_mktsegment" -> "mktsegment")

  /** A per-(tag, sf) scratch table path, CLEARED on each call. Sink
    * queries rebuild their table from scratch per invocation; a fresh
    * createTempDirectory per call leaked one full parquet table into
    * /tmp per bench rep, forever.
    */
  /** etl_view_refresh's memoized fixture per sf dir: (base table path,
    * view path, next batch id). Built once per JVM so the benched wall
    * is the steady-state maintenance pass, not fixture commit I/O.
    */
  private val viewBenchFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, java.util.concurrent.atomic.AtomicLong)]()

  /** etl_view_stream's memoized fixture per sf dir: (base table path,
    * view path, checkpoint dir, next batch id). Round 19, the
    * etl_view_refresh/media-corpus precedent applied to the streaming
    * tier: the r18 wall (9.1 s) was ~80% fixture setup — three
    * whole-table waves + bootstrap + the full catch-up drain — around a
    * maintained-fold pipeline measured FLAT at ×100 (StreamFeedScale).
    * Built once per JVM; each invocation then pays one O(batch)
    * redelivery commit + one incremental stream drain (resume on the
    * SAME checkpoint, fold exactly one version) + the CAS publish —
    * the steady-state per-trigger cost a 100 TB maintainer repeats.
    * The committed wave is a REDELIVERY (read-level LWW no-op), so the
    * view content is invocation-count-independent and the recompute
    * oracle pins it hash-exactly.
    */
  private val streamViewFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, String, java.util.concurrent.atomic.AtomicLong)]()

  /** etl_upsert_stream_sink's memoized fixture per sf dir: (upstream
    * path, mirror path, checkpoint dir, next batch id). Same round-19
    * treatment: the fixture (upstream waves + the full three-version
    * mirror drain) is built once; each invocation commits one
    * redelivery wave upstream and drains exactly that version through
    * `graft-changes → graft-upsert` on the resumed checkpoint — the
    * steady-state mirror trigger. Redelivery is an LWW no-op, so the
    * mirror's resolved content never depends on the rep count.
    */
  private val streamSinkFixtures = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, String, java.util.concurrent.atomic.AtomicLong)]()

  /** etl_table_delete_where's memoized fixture per sf dir: (table
    * path, winners parquet, replay parquet). The two whole-table waves
    * commit once per JVM; the measured loop is a RESURRECTION CYCLE
    * that keeps every rep matching: (1) re-upsert the predicate-matched
    * keys' original winning images — a content no-op on the first rep,
    * and on later reps the documented exact-duplicate-ties-win edge
    * USED ON PURPOSE to resurrect the previous rep's deletions; (2) the
    * DELETE WHERE verb itself (resolved scan under the predicate + the
    * tombstone commit — the cost the bench claims to measure); (3) the
    * subset replay (strictly older, must change nothing). The resolve
    * after (2)+(3) equals the live-keys oracle on every rep.
    */
  private val deleteWhereBenchFixtures = new java.util.concurrent
    .ConcurrentHashMap[String, (String, String, String)]()

  /** etl_upsert_delete's memoized fixture per sf dir (round-19, the
    * etl_table_delete pattern applied to its Scala-API twin): the two
    * whole-table waves commit once per JVM; the measured loop re-runs
    * the DELETE VERB itself — tombstones above every event (its
    * compactAfter=2 folds the chain each rep, keeping the fixture
    * bounded) plus the replayed old wave (the resurrection probe) —
    * all content-idempotent under LWW, so every rep resolves to the
    * same live-keys oracle.
    */
  private val upsertDeleteBenchFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** etl_table_facade / etl_table_pruned memoized fixtures per sf dir
    * (round-19): these two queries measure the READ path (the DSv1
    * facade resolve; the bucket-pruned lookup route) — the two delta
    * commits are fixture setup, re-paid every rep for a table whose
    * content never changes. Commit once per JVM; every rep then pays
    * exactly the resolve being measured. compactAfter=0 and a
    * read-only loop keep the chains constant across reps, so the
    * oracle pins every rep hash-exactly.
    */
  private val facadeBenchFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val prunedBenchFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** etl_table_delete's memoized fixture per sf dir: the table path.
    * The two whole-table upsert waves are committed once per JVM; each
    * invocation then re-runs the DELETE VERB itself — the tombstone
    * write (its compactAfter=2 folds the chain, keeping the fixture
    * bounded across reps) plus a SUBSET replay of the deleted keys'
    * own old rows (the resurrection probe) — so the wall tracks the
    * delete/resolve logic, not fixture commit I/O. Tombstones and
    * replays are content-idempotent under LWW; the live-keys oracle
    * pins every rep hash-exactly.
    */
  private val deleteBenchFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def scratchTable(tag: String, sfDir: String): String = {
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"$tag-${java.nio.file.Paths.get(sfDir).getFileName}")
    if (java.nio.file.Files.exists(base)) {
      val s = java.nio.file.Files.walk(base)
      try s.sorted(java.util.Comparator.reverseOrder()).iterator()
        .forEachRemaining(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally s.close()
    }
    java.nio.file.Files.createDirectories(base)
    base.resolve("t").toString
  }

  /** The REAL media corpus (PNG/WAV/GIF bytes over documents),
    * memoized to one parquet per sf dir: the corpus is a deterministic
    * pure function of doc_id, and re-ENCODING ~5 s of media per query
    * was fixture cost masking the DECODE kernels every mm_*_real query
    * actually measures (the etl_view_refresh memoized-fixture rule).
    * Parquet round-trips the binary payload bit-exactly, so decode
    * results are unchanged.
    */
  private def realAssetCorpus(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.Asset] = {
    import s.implicits._
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-mm-assets-${java.nio.file.Paths.get(dir).getFileName}")
    // gate on _SUCCESS, not the directory (a killed writer must not
    // poison the cache), and publish via write-aside + atomic rename so
    // two concurrent JVMs (driver Verify vs a dev Bench) can't corrupt
    // each other — the loser of the rename race just deletes its copy
    if (!java.nio.file.Files.exists(base.resolve("_SUCCESS"))) {
      val tmp = base.resolveSibling(
        base.getFileName.toString + ".tmp." +
          java.util.UUID.randomUUID().toString.take(8))
      Multimodal.realAssets(Tables.documents(s, dir))
        .write.mode("overwrite").parquet(tmp.toString)
      try java.nio.file.Files.move(tmp, base,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          // a racer published first (or a stale partial dir blocks the
          // move): serve theirs if complete, else fail loudly below
          val st = java.nio.file.Files.walk(tmp)
          try st.sorted(java.util.Comparator.reverseOrder()).iterator()
            .forEachRemaining(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally st.close()
      }
      require(java.nio.file.Files.exists(base.resolve("_SUCCESS")),
        s"$base exists without _SUCCESS — a partial media-corpus cache " +
          "from a killed writer; delete the directory and retry")
    }
    s.read.parquet(base.toString).as[Multimodal.Asset]
  }

  // lazy val, not def: Bench/Verify access these maps hundreds of times
  // (per headline name, per rep) and a def rebuilt all ~108 entries each
  // time
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ───────────────────────────── ETL parity (SURVEY.md §2.1-2.4) ──
    // Full pipeline replay of the reference's own 5-row fixture:
    // scan → envelope → route F1 → transform → route F2 → reshape → LWW.
    "etl_pipeline" -> ((s, _) => EtlPipeline.runBatch(s, AddressCsv)),

    // Same pipeline at corpus scale over the all-string customer "CSV".
    "etl_pipeline_scale" -> ((s, dir) => {
      val events = CsvExtract.toEvents(customerAsCsv(s, dir))
      val transformed = Transform.transformStage(events.filter(Rules.transformRule))
      val records = Transform.toRecord(transformed.filter(Rules.loadRule), customerRenames)
      KeyedUpsertSink.latestByKey(records, Seq("id"), Seq(col("time"))).drop("time")
    }),

    // F1 routing predicate over an envelope bus built from the events table.
    "etl_route_transform" -> ((s, dir) => {
      val bus = Tables.events(s, dir).select(
        lit(Model.Source).as("source"),
        when(col("event_type").isin("click", "view"),
          lit(Model.DetailTypes.Extraction)).otherwise(lit(Model.DetailTypes.Transform))
          .as("detailType"),
        struct(
          when(col("event_type").isin("click", "view"),
            lit(Model.Status.Extracted)).otherwise(lit(Model.Status.Transformed))
            .as("status"),
          col("event_id"), col("user_id")).as("detail"))
      bus.filter(Rules.transformRule)
        .select(col("detail.event_id").as("event_id"), col("detail.user_id").as("user_id"))
    }),

    // General EventBridge matcher set (beyond-parity Rules.matches): per
    // field matchers OR, across fields AND — prefix + wildcard + exact on
    // event_type, numeric range on value, exists + anything-but on a JSON
    // detail field. The full pattern language the reference's bus exposes.
    "etl_route_matchers" -> ((s, dir) => {
      import Rules.Match
      val bus = Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k"))
      bus.filter(Rules.matches(Map(
          "event_type" -> Seq(Match.Prefix("cl"), Match.Wildcard("v*w"),
            Match.AnyOf("purchase")),
          "value"      -> Seq(Match.Numeric(">" -> 2.0, "<=" -> 75.0)),
          "props"      -> Seq(Match.Exists(true)),
          "k"          -> Seq(Match.AnythingBut("13", "17", "29")))))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),

    // K1 keyed LWW upsert semantics as a query (load.ts:61-78).
    "etl_upsert_lww" -> ((s, dir) => EventAnalytics.latestPerUser(Tables.events(s, dir))),

    // K1 through the bucketed sink: the events stream lands in two
    // micro-batches keyed on user_id; each batch rewrites only its hash
    // buckets (O(touched), not O(table)). Read-back must equal the
    // declarative LWW — same oracle as etl_upsert_lww.
    "etl_upsert_bucketed" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-q", dir)
      val sink = graft.sink.KeyedUpsertSink.upsertBucketed(
        s, path, Seq("user_id"), Seq(col("ts_us"), col("last_event_id")), 16) _
      sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      graft.sink.KeyedUpsertSink.readBucketed(s, path).drop("ts_us")
    }),

    // K1 through the OPTIMISTIC versioned-manifest sink: same two-batch
    // split, but each batch commits by put-if-absent of the next
    // manifest version — the object-store protocol (no JVM monitor, no
    // file lock; racing drivers detect conflicts on touched-bucket
    // overlap). Read-back must equal the declarative LWW.
    "etl_upsert_optimistic" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-opt-q", dir)
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedOptimistic(
        s, path, Seq("user_id"), Seq(col("ts_us"), col("last_event_id")), 16) _
      sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      graft.sink.KeyedUpsertSink.readBucketedAtomic(s, path).drop("ts_us")
    }),

    // Change feed over the versioned sink: batch 0 (even event ids)
    // commits v1, batch 1 (odd) commits v2; the feed from v1 is every
    // row the second batch inserted or updated, AT its resolved value —
    // the incremental-consumption path ("process only what changed since
    // the last run") that replaces diffing the whole table. Oracle: the
    // full LWW minus the even-only LWW.
    "etl_upsert_changes" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-chg-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      // SELF-DESCRIBING read (round 17): no keys/order re-supplied — the
      // feed resolves the spec the first commit recorded in the manifest
      // metadata, so this oracle also gates the stored-spec path
      graft.sink.KeyedUpsertSink.readChangesBetween(
        s, path, fromVersion = 1L).drop("ts_us")
    }),

    // Incrementally-maintained materialized aggregate view over the
    // versioned sink: bootstrap a per-event-type (n_users, sum of the
    // last event's time-of-day ms) view after batch 0, then fold the
    // WEIGHTED change feed (+new image / -superseded image, touched
    // buckets only) of batches 1 and 2 into the stored view — the base
    // table is never re-read after bootstrap. The final view must equal
    // a group-by over the final LWW table, which is exactly what the
    // oracle recomputes: the hash check proves retraction correctness
    // (a user whose latest event_type changes between batches must MOVE
    // between groups, not double-count).
    "etl_view_incremental" -> ((s, dir) => {
      import graft.sink.MaterializedAggView
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-view-base-q", dir)
      val viewPath = scratchTable("graft-view-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val dims = Seq("last_event_type")
      // exact long sums: count via sum(1), and a bounded time-of-day
      // expression (raw epoch-ms sums overflow long under ANSI at scale);
      // min/max of the same expression exercise the two-path extremum
      // maintenance (retracted extrema re-derive from dirty groups only)
      val aggs = Seq(
        MaterializedAggView.AggCol("n_users", lit(1L)),
        MaterializedAggView.AggCol("sum_ts_day",
          col("last_ts_ms") % 86400000L))
      val ext = Seq(
        MaterializedAggView.ExtremumCol("min_ts_day",
          col("last_ts_ms") % 86400000L, isMin = true),
        MaterializedAggView.ExtremumCol("max_ts_day",
          col("last_ts_ms") % 86400000L, isMin = false))
      // exact retractable COUNT DISTINCT through the per-version
      // multiplicity aux table (hour-of-day: heavy value sharing, so
      // retractions exercise the collapse-only-on-last-holder path)
      // floor+cast: Column./ on longs is DOUBLE division (DuckDB // is
      // integral) — keep the distinct values long on both sides
      val nd = Seq(MaterializedAggView.DistinctCol("nd_hour",
        floor(col("last_ts_ms") % 86400000L / 3600000L).cast("long")))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
      MaterializedAggView.bootstrap(s, path, viewPath, keys, order, dims,
        aggs, ext, nd)
      sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
      MaterializedAggView.refresh(s, path, viewPath, keys, order, dims,
        aggs, ext, nd)
      sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
      MaterializedAggView.refresh(s, path, viewPath, keys, order, dims,
        aggs, ext, nd)
      MaterializedAggView.read(s, viewPath)
    }),

    // STEADY-STATE view maintenance (the bench headline for the view
    // tier): etl_view_incremental above times three whole-table commit
    // waves plus bootstrap plus refreshes in one wall — ~70% fixture
    // parquet I/O at sf0.1 (r15 finding), masking the refresh path.
    // Here the fixture (three waves + bootstrap + catch-up refresh) is
    // built ONCE per JVM per sf dir; every invocation then pays exactly
    // one O(batch) delta commit + one refresh — the per-trigger
    // maintenance cost a 100 TB deployment actually repeats, so this
    // wall moves when the REFRESH logic changes, not when commit I/O
    // does. The committed wave is a REDELIVERY (a read-level LWW
    // no-op), so the view's content is invocation-count-independent and
    // the same recompute oracle pins it hash-exactly.
    "etl_view_refresh" -> ((s, dir) => {
      import graft.sink.MaterializedAggView
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val dims = Seq("last_event_type")
      val aggs = Seq(
        MaterializedAggView.AggCol("n_users", lit(1L)),
        MaterializedAggView.AggCol("sum_ts_day",
          col("last_ts_ms") % 86400000L))
      val ext = Seq(
        MaterializedAggView.ExtremumCol("min_ts_day",
          col("last_ts_ms") % 86400000L, isMin = true),
        MaterializedAggView.ExtremumCol("max_ts_day",
          col("last_ts_ms") % 86400000L, isMin = false))
      val nd = Seq(MaterializedAggView.DistinctCol("nd_hour",
        floor(col("last_ts_ms") % 86400000L / 3600000L).cast("long")))
      // compactAfter=0 BY DESIGN: an auto-compaction landing inside a
      // later rep would put a whole-chain fold plus the feed's full-diff
      // fallback into that rep's wall — exactly the commit-I/O noise
      // this query exists to exclude. Chains grow by one generation per
      // invocation (a few reps per JVM; the min-of-reps picks the
      // shortest-chain rep, so the reported wall is stable).
      val (path, viewPath, ctr) = viewBenchFixtures.computeIfAbsent(dir, _ => {
        val p = scratchTable("graft-view-rf-base-q", dir)
        val vp = scratchTable("graft-view-rf-q", dir)
        val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
          s, p, keys, order, numBuckets = 16, compactAfter = 0) _
        sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
        MaterializedAggView.bootstrap(s, p, vp, keys, order, dims,
          aggs, ext, nd)
        sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
        sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
        MaterializedAggView.refresh(s, p, vp, keys, order, dims,
          aggs, ext, nd)
        (p, vp, new java.util.concurrent.atomic.AtomicLong(3L))
      })
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 1), ctr.getAndIncrement())
      MaterializedAggView.refresh(s, path, viewPath, keys, order, dims,
        aggs, ext, nd)
      MaterializedAggView.read(s, viewPath)
    }),

    // STREAMED view maintenance (round 17; round-19 steady-state
    // basis): the maintained view's catch-up folds arrive through the
    // `graft-changes` weighted STREAM (maintainStream: versionColumns
    // anchors + foreachBatch + the CAS publish) — the oracle's hash
    // match proves the streamed fold pipeline equals the from-scratch
    // recompute, retractions included. The fixture (waves + bootstrap
    // + the full catch-up drain) is memoized per JVM per sf dir
    // (see [[streamViewFixtures]]); the measured loop is ONE
    // redelivery commit + ONE incremental drain on the resumed
    // checkpoint — the per-trigger maintenance cost a 100 TB
    // deployment actually repeats.
    "etl_view_stream" -> ((s, dir) => {
      import graft.sink.MaterializedAggView
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val dims = Seq("last_event_type")
      val aggs = Seq(
        MaterializedAggView.AggCol("n_users", lit(1L)),
        MaterializedAggView.AggCol("sum_ts_day",
          col("last_ts_ms") % 86400000L))
      val ext = Seq(
        MaterializedAggView.ExtremumCol("min_ts_day",
          col("last_ts_ms") % 86400000L, isMin = true),
        MaterializedAggView.ExtremumCol("max_ts_day",
          col("last_ts_ms") % 86400000L, isMin = false))
      val nd = Seq(MaterializedAggView.DistinctCol("nd_hour",
        floor(col("last_ts_ms") % 86400000L / 3600000L).cast("long")))
      val (path, viewPath, ckpt, ctr) =
        streamViewFixtures.computeIfAbsent(dir, _ => {
          val p = scratchTable("graft-view-stream-base-q", dir)
          val vp = scratchTable("graft-view-stream-q", dir)
          val ck = scratchTable("graft-view-stream-ckpt-q", dir)
          val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
            s, p, keys, order, numBuckets = 16, compactAfter = 0) _
          sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
          MaterializedAggView.bootstrap(s, p, vp, keys, order, dims,
            aggs, ext, nd)
          sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
          sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
          MaterializedAggView.maintainStream(s, p, vp, keys, order,
            dims, aggs, ext, nd, checkpointDir = ck).awaitTermination()
          (p, vp, ck, new java.util.concurrent.atomic.AtomicLong(3L))
        })
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 1), ctr.getAndIncrement())
      val q = MaterializedAggView.maintainStream(s, path, viewPath, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt)
      q.awaitTermination()
      MaterializedAggView.read(s, viewPath)
    }),

    // SLICED streamed view maintenance (round 17, second pass): the same
    // pipeline under SUB-VERSION admission control — maxBucketsPerTrigger
    // splits each fat catch-up version into bucket slices, the fold
    // anchors on (version, bucketCursor), the view walks through
    // mid-version watermarks (mixed-state extremum recomputes) and must
    // STILL land on the identical from-scratch recompute. The 100 TB
    // story: one giant commit (compaction/backfill) no longer dictates
    // the maintainer's peak batch size. Verify-only, same envelope
    // rationale as etl_view_stream.
    "etl_view_stream_sliced" -> ((s, dir) => {
      import graft.sink.MaterializedAggView
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-view-slstream-base-q", dir)
      val viewPath = scratchTable("graft-view-slstream-q", dir)
      val ckpt = scratchTable("graft-view-slstream-ckpt-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val dims = Seq("last_event_type")
      val aggs = Seq(
        MaterializedAggView.AggCol("n_users", lit(1L)),
        MaterializedAggView.AggCol("sum_ts_day",
          col("last_ts_ms") % 86400000L))
      val ext = Seq(
        MaterializedAggView.ExtremumCol("min_ts_day",
          col("last_ts_ms") % 86400000L, isMin = true),
        MaterializedAggView.ExtremumCol("max_ts_day",
          col("last_ts_ms") % 86400000L, isMin = false))
      val nd = Seq(MaterializedAggView.DistinctCol("nd_hour",
        floor(col("last_ts_ms") % 86400000L / 3600000L).cast("long")))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
      MaterializedAggView.bootstrap(s, path, viewPath, keys, order, dims,
        aggs, ext, nd)
      // both catch-up commits touch ~all 16 buckets → ~6 slices each at
      // the cap of 3, every one a mid-version anchored fold
      sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
      sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
      val q = MaterializedAggView.maintainStream(s, path, viewPath, keys,
        order, dims, aggs, ext, nd, checkpointDir = ckpt,
        maxBucketsPerTrigger = Some(3L))
      q.awaitTermination()
      MaterializedAggView.read(s, viewPath)
    }),

    // Schema-WIDENING upsert under the round-17 evolution contract: the
    // second batch ADDS a column; rows whose LWW winner predates it
    // read null there (widen-with-nulls — the deliberate choice; drops
    // and retypes are refused loudly, spec-pinned). The oracle computes
    // the same LWW with the added column nulled for old-batch winners.
    "etl_upsert_evolve" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_us"))
      val path = scratchTable("graft-upsert-evolve-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      // batch 0: the narrow schema (no event-type column yet)
      sink(ev.filter(col("last_event_id") % 2 === 0)
        .drop("last_event_type"), 0L)
      // batch 1: widened — adds last_event_type
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      graft.sink.KeyedUpsertSink.readBucketedDelta(s, path)
        .drop("ts_us")
    }),

    // Maintained SECOND MOMENTS: the view stores exact long sums of x
    // and x² (the q_stats hi/lo split keeps the x² totals inside a LONG
    // at any plausible scale: x = time-of-day ms ≤ 8.64e7, x² ≤ 7.5e15
    // < 2^53, hi ≤ 7.5e7·n, lo ≤ 1e8·n) folded incrementally from the
    // weighted feed — integer adds commute with retraction, so the
    // maintained moments are bit-exact — and stddev derives ON READ
    // from the exact moments with q_stats' one-double-cast discipline.
    // The oracle recomputes stddev from scratch over the final LWW: the
    // hash match proves a maintained stats surface equals the batch one.
    "etl_view_stats" -> ((s, dir) => {
      import graft.sink.MaterializedAggView
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-view-stats-base-q", dir)
      val viewPath = scratchTable("graft-view-stats-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val dims = Seq("last_event_type")
      val split = 100000000L
      val x = col("last_ts_ms") % 86400000L
      val xx = x * x
      val aggs = Seq(
        MaterializedAggView.AggCol("n_users", lit(1L)),
        MaterializedAggView.AggCol("sum_x", x),
        // `/` on longs is double division; exact here since xx < 2^53
        MaterializedAggView.AggCol("xx_hi", (xx / split).cast("long")),
        MaterializedAggView.AggCol("xx_lo", xx % split))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
      MaterializedAggView.bootstrap(s, path, viewPath, keys, order, dims, aggs)
      sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
      MaterializedAggView.refresh(s, path, viewPath, keys, order, dims, aggs)
      sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
      MaterializedAggView.refresh(s, path, viewPath, keys, order, dims, aggs)
      val v = MaterializedAggView.read(s, viewPath)
      val n = col("n_users")
      val dx = col("sum_x").cast("double")
      val dxx = (col("xx_hi").cast("decimal(38,0)") * lit(split) + col("xx_lo"))
        .cast("double")
      // clamp at 0: rounding in dxx - dx²/n can land ~-1e-10 on a
      // constant-valued group; sqrt would yield NaN and the ANSI
      // decimal cast would throw (exact variance there is 0)
      val varX = greatest(dxx - pow(dx, lit(2)) / n, lit(0.0))
      v.select(col("last_event_type"), n,
        when(n > 1, sqrt(varX / (n - 1)))
          .cast("decimal(18,6)").cast("double").as("stddev_ts_day"))
    }),

    // Bucket-pruned point lookup: resolve ONLY the buckets the requested
    // keys hash to (the _layout sidecar supplies the writer's bucket
    // count) — the O(requested keys) read path a 100 TB keyed table
    // must have. Request set: every 17th user. Oracle: the LWW
    // restricted to those users.
    "etl_upsert_lookup" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-lkp-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 0) _
      sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      val wanted = ev.select("user_id").where(col("user_id") % 17 === 0).distinct()
      // SELF-DESCRIBING lookup (round 17): spec from manifest metadata
      graft.sink.KeyedUpsertSink.lookupBucketed(s, path, wanted).drop("ts_us")
    }),

    // K1 through the MERGE-ON-READ delta sink: four small batches, each
    // appending O(batch) bytes to its buckets' generation chains (no
    // bucket rewrite), with the LWW resolve deferred to readBucketedDelta
    // (order, then chain recency). Batch 3 redelivers batch 1 — the
    // at-least-once replay must be a read-level no-op. compactAfter=3
    // forces a chain fold inside the run, so the query exercises append,
    // redelivery, compaction and resolved read in one pass. Read-back
    // must equal the declarative LWW — same oracle as etl_upsert_lww.
    "etl_upsert_delta" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-delta-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 3) _
      sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
      sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
      sink(ev.filter(col("last_event_id") % 3 === 1), 3L) // redelivery
      graft.sink.KeyedUpsertSink.readBucketedDelta(s, path, keys, order)
        .drop("ts_us")
    }),

    // Event-sourced DELETE (round 17): tombstones for user_id % 7 == 0
    // commit with an order value above every event; the delete's own
    // compactAfter=2 folds the whole chain IMMEDIATELY AFTER the
    // tombstones land, and only then does a REPLAYED old wave try to
    // resurrect the keys — so the oracle hash (live-keys-only LWW)
    // discriminates a fold that drops winning tombstones: the replay
    // arrives AFTER the fold and must still lose.
    "etl_upsert_delete" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      // the two whole-table waves are memoized per JVM (see
      // [[upsertDeleteBenchFixtures]] — the etl_table_delete pattern on
      // its Scala-API twin); the measured loop is the delete verb +
      // fold + replay + resolve, all content-idempotent under LWW
      val path = upsertDeleteBenchFixtures.computeIfAbsent(dir, _ => {
        val p = scratchTable("graft-upsert-delete-q", dir)
        val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
          s, p, keys, order, numBuckets = 16, compactAfter = 3) _
        sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
        sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
        p
      })
      graft.sink.KeyedUpsertSink.deleteBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 2)(
        ev.filter(col("user_id") % 7 === 0).select(col("user_id"))
          .distinct()
          .withColumn("ts_us", lit(4102444800000000L)) // above every event
          .withColumn("last_event_id", lit(null).cast("long")), 2L)
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 16, compactAfter = 3)(
        ev.filter(col("last_event_id") % 2 === 1), 3L) // replayed wave
      graft.sink.KeyedUpsertSink.readBucketedDelta(s, path, keys, order)
        .drop("ts_us")
    }),

    // The SQL-level FACADE over the keyed table (round 17 second pass):
    // the same delta-sink fixture read back through
    // `spark.read.format("graft-table")` with ONLY a path — the stored
    // spec drives the LWW resolve through the DSv1 relation, so a pure
    // SQL user gets the identical answer. Same oracle as
    // etl_upsert_lww: the facade must change nothing.
    "etl_table_facade" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      // fixture memoized per JVM (see [[facadeBenchFixtures]]): the
      // measured surface is the facade RESOLVE, not the two setup
      // commits; chains stay constant because the loop is read-only
      val path = facadeBenchFixtures.computeIfAbsent(dir, _ => {
        val p = scratchTable("graft-table-facade-q", dir)
        val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
          s, p, keys, order, numBuckets = 16, compactAfter = 0) _
        sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
        sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
        p
      })
      s.read.format("graft-table").option("path", path).load()
        .drop("ts_us")
    }),

    // The SQL BATCH WRITE (round 18): the whole keyed-table round trip
    // through the format surface alone — `df.write.format("graft-table")
    // .mode("append")` creates the table on its first commit (the
    // options record the spec) and UPSERTS on the second (stored spec,
    // no options), then the facade reads the LWW back. Same oracle as
    // etl_upsert_lww: the write facade must change nothing either.
    "etl_table_write" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-table-write-q", dir)
      ev.filter(col("last_event_id") % 2 === 0)
        .write.format("graft-table").option("path", path)
        .option("keys", "user_id").option("orderBy", "ts_us,last_event_id")
        .option("numBuckets", "16")
        .mode("append").save()
      ev.filter(col("last_event_id") % 2 === 1)
        .write.format("graft-table").option("path", path)
        .mode("append").save() // stored spec drives the second commit
      s.read.format("graft-table").option("path", path).load()
        .drop("ts_us")
    }),

    // The SQL DELETE verb (round 18): the etl_upsert_delete scenario
    // driven entirely through the format surface — two upsert commits
    // via df.write, then a `option("delete", "true")` write tombstones
    // user_id % 7 == 0 above every event (its compactAfter=2 folds the
    // chain IMMEDIATELY after the tombstones land), and a replayed old
    // wave arriving AFTER the fold must still lose. Same oracle as
    // etl_upsert_delete: the live-keys-only LWW, so the hash
    // discriminates both a fold that drops winning tombstones and any
    // drift between the SQL verb and the Scala API.
    "etl_table_delete" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      // the two whole-table waves are memoized per JVM (see
      // [[deleteBenchFixtures]]); the measured loop re-runs the DELETE
      // VERB itself — tombstones (compactAfter=2 folds the chain each
      // rep, bounding the fixture) + a SUBSET replay of the deleted
      // keys' own old rows (the resurrection probe) — all
      // content-idempotent under LWW, so every rep resolves to the
      // same live-keys oracle
      val path = deleteBenchFixtures.computeIfAbsent(dir, _ => {
        val p = scratchTable("graft-table-delete-q", dir)
        ev.filter(col("last_event_id") % 2 === 0)
          .write.format("graft-table").option("path", p)
          .option("keys", "user_id").option("orderBy", "ts_us,last_event_id")
          .option("numBuckets", "16")
          .mode("append").save()
        ev.filter(col("last_event_id") % 2 === 1)
          .write.format("graft-table").option("path", p)
          .mode("append").save()
        p
      })
      ev.filter(col("user_id") % 7 === 0).select(col("user_id"))
        .distinct()
        .withColumn("ts_us", lit(4102444800000000L)) // above every event
        .withColumn("last_event_id", lit(null).cast("long"))
        .write.format("graft-table").option("path", path)
        .option("delete", "true").option("compactAfter", "2")
        .mode("append").save()
      ev.filter(col("user_id") % 7 === 0 && col("last_event_id") % 2 === 1)
        .write.format("graft-table").option("path", path) // replayed wave
        .mode("append").save()
      s.read.format("graft-table").option("path", path).load()
        .drop("ts_us")
    }),

    // DELETE WHERE (round 19): predicate-driven delete through the
    // format surface — two upsert waves, then an EMPTY write with
    // `option("deleteWhere", ...)` tombstones every key whose RESOLVED
    // image is an odd-event_id click, each tombstone ranked at the
    // matched image's OWN order values (the weighted-mirror precedent).
    // A replayed EVEN wave then lands AFTER the delete: every replayed
    // row of a deleted key is strictly older than its tombstone (no
    // deleted winner is even by construction), so the keys must stay
    // dead — the oracle hash discriminates both a predicate evaluated
    // against raw version-rows instead of the LWW snapshot and a
    // tombstone ranked too low to survive the replay.
    "etl_table_delete_where" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      // fixture memoized per JVM (see [[deleteWhereBenchFixtures]]):
      // the measured loop is resurrect → DELETE WHERE → subset replay,
      // so every rep pays the verb's real cost (resolved scan under
      // the predicate + tombstone commit), never the two-wave fixture
      val (path, winnersPath, replayPath) =
        deleteWhereBenchFixtures.computeIfAbsent(dir, _ => {
          val p = scratchTable("graft-table-delete-where-q", dir)
          ev.filter(col("last_event_id") % 2 === 0)
            .write.format("graft-table").option("path", p)
            .option("keys", "user_id")
            .option("orderBy", "ts_us,last_event_id")
            .option("numBuckets", "16")
            .mode("append").save()
          ev.filter(col("last_event_id") % 2 === 1)
            .write.format("graft-table").option("path", p)
            .mode("append").save()
          // the predicate-matched winners' ORIGINAL images (the
          // resurrection wave) and the replay subset, staged once
          val winners = graft.sink.KeyedUpsertSink.latestByKey(ev,
            Seq("user_id"), Seq(col("ts_us"), col("last_event_id")))
            .filter(col("last_event_type") === "click" &&
              col("last_event_id") % 2 === 1)
          val base = java.nio.file.Paths.get(p).getParent
          val wp = base.resolve("winners").toString
          val rp = base.resolve("replay").toString
          winners.write.mode("overwrite").parquet(wp)
          ev.filter(col("last_event_id") % 2 === 0)
            .join(winners.select("user_id"), Seq("user_id"), "left_semi")
            .write.mode("overwrite").parquet(rp)
          (p, wp, rp)
        })
      s.read.parquet(winnersPath) // resurrect (rep 1: content no-op)
        .write.format("graft-table").option("path", path)
        .mode("append").save()
      s.emptyDataFrame
        .write.format("graft-table").option("path", path)
        .option("deleteWhere",
          "last_event_type = 'click' AND last_event_id % 2 = 1")
        .mode("append").save()
      s.read.parquet(replayPath) // replayed wave, strictly older
        .write.format("graft-table").option("path", path)
        .mode("append").save()
      s.read.format("graft-table").option("path", path).load()
        .drop("ts_us")
    }),

    // UPDATE WHERE (round 19, second pass): predicate-driven update
    // through the format surface — two upsert waves, then an EMPTY
    // write with updateWhere + set rewrites every key whose RESOLVED
    // image is an odd-event_id error (type renamed, ts bumped — the
    // SET evaluates against the matched image), each rewritten image
    // ranked at the matched image's OWN order values. The replayed
    // EVEN wave lands after and must not revert anything (no updated
    // winner is even by construction). Verify-only: its wall is the
    // deleteWhere cost shape (one resolved scan + one commit), so the
    // bench measures nothing new. The oracle applies the same CASE
    // transformation to the full-set LWW winners.
    "etl_table_update_where" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-table-update-where-q", dir)
      ev.filter(col("last_event_id") % 2 === 0)
        .write.format("graft-table").option("path", path)
        .option("keys", "user_id").option("orderBy", "ts_us,last_event_id")
        .option("numBuckets", "16")
        .mode("append").save()
      ev.filter(col("last_event_id") % 2 === 1)
        .write.format("graft-table").option("path", path)
        .mode("append").save()
      s.emptyDataFrame
        .write.format("graft-table").option("path", path)
        .option("updateWhere",
          "last_event_type = 'error' AND last_event_id % 2 = 1")
        .option("set",
          "last_event_type = 'err_rev', last_ts_ms = last_ts_ms + 1")
        .mode("append").save()
      ev.filter(col("last_event_id") % 2 === 0) // replayed wave
        .write.format("graft-table").option("path", path)
        .mode("append").save()
      s.read.format("graft-table").option("path", path).load()
        .drop("ts_us")
    }),

    // The facade's PRUNED route (round 17 third pass): a key-equality
    // IN list routes through lookupBucketed — only the buckets the 64
    // pinned keys hash to are read, the LWW resolve runs per key inside
    // them, and Spark re-applies the filter above. The oracle recomputes
    // the same LWW subset from scratch, so a hash match proves bucket
    // pruning loses no version-row of a pinned key.
    "etl_table_pruned" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      // fixture memoized per JVM (see [[facadeBenchFixtures]] — same
      // rationale): the measured surface is the bucket-pruned lookup
      // route, not the two setup commits
      val path = prunedBenchFixtures.computeIfAbsent(dir, _ => {
        val p = scratchTable("graft-table-pruned-q", dir)
        val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
          s, p, keys, order, numBuckets = 16, compactAfter = 0) _
        sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
        sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
        p
      })
      s.read.format("graft-table").option("path", path).load()
        .filter(col("user_id").isin((0L until 64L).map(x => x: Any): _*))
        .drop("ts_us")
    }),

    // The DECLARATIVE replica pipeline (round 17 second pass):
    // `readStream graft-changes → writeStream graft-upsert` with zero
    // user code between them — the upsert feed of table A streams into
    // table B, whose sink skips replays through the `stream.<id>`
    // metadata high-water. B's resolved read must equal the LWW oracle
    // — i.e. the mirror is exact.
    "etl_upsert_stream_sink" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      def mirror(a: String, b: String, ckpt: String): Unit = {
        val q = s.readStream.format("graft-changes")
          .option("path", a).option("startingVersion", "0")
          .option("maxVersionsPerTrigger", "1")
          .load()
          .writeStream.format("graft-upsert")
          .option("path", b).option("streamId", "mirror")
          .option("keys", "user_id").option("orderBy", "ts_us,last_event_id")
          .option("numBuckets", "16")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // fixture memoized per JVM (see [[streamSinkFixtures]]): upstream
      // waves + the full three-version mirror drain happen once; the
      // measured loop is one redelivery commit + the one-version drain
      // on the resumed checkpoint — the steady-state mirror trigger
      val (a, b, ckpt, ctr) = streamSinkFixtures.computeIfAbsent(dir, _ => {
        val pa = scratchTable("graft-streamsink-a-q", dir)
        val pb = scratchTable("graft-streamsink-b-q", dir)
        val ck = scratchTable("graft-streamsink-ckpt-q", dir)
        val sink = graft.sink.KeyedUpsertSink.upsertBucketedDelta(
          s, pa, keys, order, numBuckets = 16, compactAfter = 0) _
        sink(ev.filter(col("last_event_id") % 3 === 0), 0L)
        sink(ev.filter(col("last_event_id") % 3 === 1), 1L)
        sink(ev.filter(col("last_event_id") % 3 === 2), 2L)
        mirror(pa, pb, ck)
        (pa, pb, ck, new java.util.concurrent.atomic.AtomicLong(3L))
      })
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, a, keys, order, numBuckets = 16, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 1), ctr.getAndIncrement())
      mirror(a, b, ckpt)
      graft.sink.KeyedUpsertSink.readBucketedDelta(s, b).drop("ts_us")
    }),

    // Online re-bucketing mid-stream: two delta batches land in 8
    // buckets, rebucketTable re-hashes the table into 32 in ONE
    // versioned commit (layout metadata rides the same manifest file as
    // the data swap), and a third batch commits under the NEW layout.
    // The resolved read after all three must equal the declarative LWW
    // — same oracle as etl_upsert_lww — proving the resize changed the
    // physical layout without touching a single logical row.
    "etl_upsert_rebucket" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-rbk-q", dir)
      val keys = Seq("user_id")
      val order = Seq(col("ts_us"), col("last_event_id"))
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 8, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 0), 0L)
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 8, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 1), 1L)
      graft.sink.KeyedUpsertSink.rebucketTable(s, path, keys, order, 32)
      graft.sink.KeyedUpsertSink.upsertBucketedDelta(
        s, path, keys, order, numBuckets = 32, compactAfter = 0)(
        ev.filter(col("last_event_id") % 3 === 2), 2L)
      graft.sink.KeyedUpsertSink.readBucketedDelta(s, path, keys, order)
        .drop("ts_us")
    }),

    // K1 through the ATOMIC generation-manifest sink: same two-batch
    // split, but each batch stages under gen-<id>/ and commits by one
    // manifest rename — a crash mid-write can't tear the table. Read-back
    // must equal the declarative LWW — same oracle as etl_upsert_lww.
    "etl_upsert_atomic" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("ts_ms").as("last_ts_ms"), col("ts_us"))
      val path = scratchTable("graft-upsert-atomic-q", dir)
      val sink = graft.sink.KeyedUpsertSink.upsertBucketedAtomic(
        s, path, Seq("user_id"), Seq(col("ts_us"), col("last_event_id")), 16) _
      sink(ev.filter(col("last_event_id") % 2 === 0), 0L)
      sink(ev.filter(col("last_event_id") % 2 === 1), 1L)
      graft.sink.KeyedUpsertSink.readBucketedAtomic(s, path).drop("ts_us")
    }),

    // K3 observe channel: multicast tap + per-stage tally (README.md:27).
    "etl_audit_tally" -> ((s, dir) => {
      val extraction = CsvExtract.toEvents(customerAsCsv(s, dir))
      val transformed = Transform.transformStage(extraction.filter(Rules.transformRule))
      AuditSink.tally(AuditSink.tap(Map(
        "extract" -> extraction.filter(Rules.observeRule),
        "transform" -> transformed.filter(Rules.observeRule))))
    }),

    // P1 bug-compatible split/zip (transform.ts:53-61) on a wire string.
    "etl_zip_naive" -> ((s, dir) => {
      val wire = Tables.customer(s, dir).select(
        lit("id,name").as("headers"),
        concat_ws(",", col("c_custkey"), col("c_name")).as("data"))
      wire.select(Transform.zipNaive(col("headers"), col("data")).as("m"))
        .select(element_at(col("m"), "id").as("id"), element_at(col("m"), "name").as("name"))
    }),

    // P7 JSON wire round-trip: envelope → to_json → from_json → unwrap.
    "etl_wire_roundtrip" -> ((s, dir) => {
      val events = CsvExtract.toEvents(customerAsCsv(s, dir))
      val schema = events.schema("detail").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Transform.fromWire(Transform.toWire(events), schema)
        .select(
          element_at(col("detail.data"), "c_custkey").as("id"),
          element_at(col("detail.data"), "c_name").as("name"))
    }),

    // ────────────── relational analytics (SURVEY.md §2.6 showcase) ──
    "q1_agg"           -> ((s, dir) => Queries.q1PricingSummary(s, dir)),
    "q3_topk"          -> ((s, dir) => Queries.q3TopUnshipped(s, dir)),
    "q5_join"          -> ((s, dir) => Queries.q5RevenueByNation(s, dir)),
    "q_window_rank"    -> ((s, dir) => Queries.topOrdersPerCustomer(s, dir)),
    // same result via the bounded-heap TypedImperativeAggregate
    "q_topk_agg"       -> ((s, dir) => Queries.topOrdersPerCustomerAgg(s, dir)),
    "q_window_running" -> ((s, dir) => Queries.runningQtyPerSupplier(s, dir)),
    // RANGE-frame analytic: 30-day trailing revenue per customer.
    "q_window_range" -> ((s, dir) => Queries.trailingRevenuePerCustomer(s, dir)),
    "q_rollup"         -> ((s, dir) => Queries.rollupCounts(s, dir)),
    "q_cube"           -> ((s, dir) => Queries.cubeCounts(s, dir)),
    "q_grouping_sets"  -> ((s, dir) => Queries.groupingSetsCounts(s, dir)),
    // exact fixed-point PageRank over the customer↔supplier graph —
    // integer floor arithmetic makes every iteration engine-identical,
    // so the oracle (same iterations unrolled as CTEs) hash-checks the
    // whole dynamics, not just a projection
    "q_pagerank"       -> ((s, dir) => GraphAnalytics.supplierCustomerPageRank(s, dir)),
    // sketch internals are engine-specific → rows-only checks.
    "q_approx_distinct" -> ((s, dir) => Queries.approxDistinctParts(s, dir)),
    "q_approx_quantiles" -> ((s, dir) => Queries.approxQuantiles(s, dir)),
    "q_anti_join"      -> ((s, dir) => Queries.customersWithoutOrders(s, dir)),
    // salted skew join: oracle is the PLAIN join — hash match proves the
    // salting construction is invisible to results (Layout.saltedJoin).
    "q_skew_join"      -> ((s, dir) => Queries.skewJoinRevenue(s, dir)),
    "q_semi_join"      -> ((s, dir) => Queries.partsWithSales(s, dir)),
    "q_distinct_agg"   -> ((s, dir) => Queries.distinctCustomersPerSegment(s, dir)),

    // ─────────────────────────────────── event-stream analytics ──
    "events_tally"      -> ((s, dir) => EventAnalytics.tally(Tables.events(s, dir))),
    "events_sessionize" -> ((s, dir) => EventAnalytics.sessionize(Tables.events(s, dir))),
    "events_tumbling"   -> ((s, dir) => EventAnalytics.tumblingDaily(Tables.events(s, dir))),
    "events_gap_fill"   -> ((s, dir) => EventAnalytics.gapFillHourly(Tables.events(s, dir))),
    "events_funnel"     -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), "signup", "purchase")),
    // as-of join: every purchase matched to the user's latest prior click.
    "events_asof_join"  -> ((s, dir) =>
      EventAnalytics.asofJoin(Tables.events(s, dir), "purchase", "click")),
    "events_json_extract" -> ((s, dir) =>
      EventAnalytics.jsonKSum(Tables.events(s, dir))),
    "events_pivot" -> ((s, dir) => EventAnalytics.pivotCounts(
      Tables.events(s, dir), Seq("click", "error", "purchase", "signup", "view"))),
    // bucketized range join: same-user events within 60s after a purchase.
    "events_range_join" -> ((s, dir) =>
      EventAnalytics.rangeJoinAfter(Tables.events(s, dir), "purchase", 60)),
    // keyless interval-overlap join (grid-bucketed, emit-once): user
    // sessions live during global error bursts.
    "events_interval_join" -> ((s, dir) =>
      EventAnalytics.sessionsDuringBursts(Tables.events(s, dir))),
    "q_median" -> ((s, dir) => Queries.medianOrderValue(s, dir)),
    "events_lead_lag" -> ((s, dir) =>
      EventAnalytics.eventNeighborhood(Tables.events(s, dir))),
    // cohort retention: users by first-seen day × day-offset activity.
    "events_retention" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir))),
    // fixed-width value histogram per event type.
    "events_histogram" -> ((s, dir) =>
      EventAnalytics.valueHistogram(Tables.events(s, dir))),
    "q_set_ops" -> ((s, dir) => Queries.buildingWithoutBigOrders(s, dir)),
    "q_ntile"   -> ((s, dir) => Queries.orderQuartiles(s, dir)),
    "q_stats"   -> ((s, dir) => Queries.statsQuantityPrice(s, dir)),
    "q_strings" -> ((s, dir) => Queries.partNameStrings(s, dir)),

    // ───────────────────────────────────────────── text analysis ──
    "text_tokens" -> ((s, dir) => Tables.documents(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"))),
    "text_quality" -> ((s, dir) => TextAnalysis.qualitySignals(Tables.documents(s, dir))),
    "text_langid" -> ((s, dir) => Tables.documents(s, dir).select(
      col("doc_id"), TextAnalysis.langIdFast(col("text")).as("lang"))),
    // TRAINED language ID (round 18): smoothed unigram naive Bayes fit
    // on the doc_id % 5 != 0 labeled slice (no marker list), decided by
    // argmax Σ ⌊log2 p(w|l)⌋ — the floor-log2 keeps true NB's product
    // rule exact-integer in both engines (length(bin(x))-1), so the
    // oracle replays the train+predict pipeline bit-for-bit. The
    // held-out fifth of the corpus is predicted by a model that never
    // saw it.
    "text_langid_trained" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.trainedLangId(docs, col("doc_id") % 5 =!= 0),
          Seq("doc_id"))
    }),
    "text_fingerprint" -> ((s, dir) => Tables.documents(s, dir).select(
      col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))),
    // md5-derived token hash → oracle-checked (list_reduce recurrence).
    "text_rollinghash" -> ((s, dir) => Tables.documents(s, dir).select(
      col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rh"))),
    // the composed corpus-cleaning pipeline (quality → lang → dedup).
    "text_clean_corpus" -> ((s, dir) =>
      TextAnalysis.cleanCorpus(Tables.documents(s, dir))),
    // PII redaction: the corpus text is [a-z ]-only, so the PII-bearing
    // wire column is synthesized deterministically from doc_id (same
    // discipline as the etl_* wire setups) — an email always, a phone
    // unless doc_id%5=0, an IPv4 always, a 9-digit id when doc_id%3=0 —
    // then redacted + counted by the codegen'd regexp chain.
    "text_pii_redact" -> ((s, dir) => {
      val raw = concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.com"),
        when(col("doc_id") % 5 =!= 0,
          concat(lit(" call "), (col("doc_id") % 800 + 200).cast("string"),
            lit("-555-"), lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), ((col("doc_id") * 3) % 256).cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" ssn "),
            lpad(((col("doc_id") * 13) % 1000000000).cast("string"), 9, "0")))
          .otherwise(lit("")))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .select(Seq(col("doc_id"), TextAnalysis.redactPii(col("raw")).as("clean_text"))
          ++ TextAnalysis.piiCounts(col("raw")): _*)
    }),

    // ─────────────────────────────────────────────── dedup suite ──
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    "dedup_exact_survivors" -> ((s, dir) =>
      Dedup.exactSurvivors(Tables.documents(s, dir)).select("doc_id", "lang", "source", "n_chars")),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.blockedJaccardPairs(Tables.documents(s, dir))),
    // the EXHAUSTIVE form — every pair with J >= t, no length window —
    // via prefix-filter candidates (All-Pairs/PPJoin; oracle replays a
    // brute-force all-pairs join, feasible at oracle scale).
    "dedup_ngram_allpairs" -> ((s, dir) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, dir))),
    // passage-level dedup: maximal token spans covered by window-grams
    // occurring ≥2 times corpus-wide (rolling-hash chains → islands).
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringDupSpans(Tables.documents(s, dir))),
    // the applied removals: every document rebuilt without its flagged
    // passages (docs without spans pass through verbatim).
    "dedup_substring_strip" -> ((s, dir) =>
      Dedup.stripSubstringDups(Tables.documents(s, dir)).select("doc_id", "text")),
    // md5-derived signatures → both LSH pipelines are engine-reproducible
    // and oracle-checked stage by stage (signature, band bucket, pair).
    "dedup_minhash" -> ((s, dir) => Dedup.minhashNearDups(Tables.documents(s, dir))),
    // same banded candidates, character-level Levenshtein verify (the
    // OCR-noise/template-drift gate; banded threshold DP, exact integer
    // distance in both engines).
    "dedup_editdist" -> ((s, dir) => Dedup.editDistanceNearDups(Tables.documents(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashNearDups(Tables.documents(s, dir))),
    // connected components over the exact near-dup pairs: one canonical
    // cluster id per document (oracle: recursive CTE over the same pairs).
    "dedup_cluster" -> ((s, dir) => Dedup.jaccardClusters(Tables.documents(s, dir))),

    // ─────────────────────────── corpus hygiene + curation ──
    // benchmark decontamination: corpus docs sharing bigrams with the
    // held-out "benchmark" subset (doc_id % 37 = 0 stands in for it).
    "text_decontaminate" -> ((s, dir) =>
      Dedup.decontaminate(Tables.documents(s, dir), col("doc_id") % 37 === 0)),
    // same contamination result via the Bloom-prefiltered physical path
    // (map-side bitset test → exact verify): the shape for benchmark
    // indexes too large to broadcast. False positives die in the verify
    // join, so the oracle is the exact decontaminate SQL.
    "text_decontaminate_bloom" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.decontaminateBloom(
        docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0))
    }),
    // top characteristic terms per doc (rational-idf tf-idf family).
    "text_top_terms" -> ((s, dir) => TextAnalysis.topTerms(Tables.documents(s, dir))),

    // BM25-family ranked retrieval (rational idf — see the operator doc
    // for why ln stays out of the oracle-checked score).
    "text_retrieval_bm25" -> ((s, dir) => TextAnalysis.retrievalScore(
      Tables.documents(s, dir), Seq("join", "scan", "slow"))),
    // LM-based curation: CCNet-style bigram surprisal gate and
    // DSIR-style importance weights, both against the English slice as
    // the reference/target model (fixed-point mean-ratio forms — see the
    // operator docs for why ln stays out of the oracle-checked scores).
    "text_ppl" -> ((s, dir) => TextAnalysis.bigramSurprisal(
      Tables.documents(s, dir), col("lang") === "en")),
    "text_dsir" -> ((s, dir) => TextAnalysis.dsirWeights(
      Tables.documents(s, dir), col("lang") === "en")),
    // Gopher-style repetition signals: most-repeated unigram/bigram mass.
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir))),
    // per-language percentile length gate (group-relative outlier cut).
    "text_length_filter" -> ((s, dir) => TextAnalysis.lengthOutlierFilter(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
      col("lang"))),
    // deterministic content-hash sampling: reruns select the same subset.
    // Deterministic train/val/test split assignment (growth-stable).
    "sample_split" -> ((s, dir) => Sampling.datasetSplit(
      Tables.documents(s, dir).select("doc_id"), col("doc_id"))),

    "sample_hash" -> ((s, dir) => Sampling.hashBernoulli(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
      col("doc_id"), sixteenths = 4)),
    "sample_stratified" -> ((s, dir) => Sampling.stratifiedTopN(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
      col("lang"), col("doc_id"), n = 50)),
    // the composed curation pipeline: quality → repetition → language →
    // dedup → decontaminate → mixture → pack, one declarative plan.
    // minShared=40: the synthetic corpus shares common bigrams broadly
    // (median 26 with the benchmark subset), so the contamination bar
    // sits at the distribution's tail — a policy knob, like the other
    // thresholds.
    "text_curation_pipeline" -> ((s, dir) => graft.pipeline.Curation.curate(
      Tables.documents(s, dir), col("doc_id") % 37 === 0, minShared = 40L)),
    // temperature-0.5 language rebalancing (rate = sqrt(n_min/n_g)).
    "sample_mixture" -> ((s, dir) => Sampling.mixtureSqrt(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
      col("lang"), col("doc_id"))),
    // token-budget sequence packing, per-source shards, budget 2048.
    "pack_sequences" -> ((s, dir) => Sampling.packSequences(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tok")),
      col("source"), col("doc_id"), col("n_tok"), budget = 2048L).drop("n_tok")),
    // the same packer under the REAL tokenizer (round 18): budgets are
    // BPE piece counts from the trained merge table, not whitespace
    // tokens — the composition a pretraining pipeline actually runs.
    // (Verify-only: its wall is the bpe_vocab+bpe_encode pair already
    // measured in the headline, plus one window.)
    "pack_sequences_bpe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Sampling.packSequences(
        docs.select(col("doc_id"), col("source"))
          .join(TextAnalysis.bpeEncode(docs).select("doc_id", "n_pieces"),
            Seq("doc_id")),
        col("source"), col("doc_id"), col("n_pieces"), budget = 2048L)
        .drop("n_pieces")
    }),
    // deterministic epoch-1 shuffle into 8 training shards.
    "sample_epoch_shuffle" -> ((s, dir) => Sampling.epochShuffle(
      Tables.documents(s, dir).select("doc_id"),
      col("doc_id"), epoch = 1, nShards = 8)),
    // per-domain cap over synthesized messy URLs (scheme/case/www/port/
    // query/fragment variants, 37 domains): canonicalize, then keep the
    // md5-rank top 8 per domain — the standard web-corpus source gate.
    "sample_domain_cap" -> ((s, dir) => {
      val wire = Tables.documents(s, dir).select(col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0, lit("HTTPS://"))
            .when(col("doc_id") % 3 === 1, lit("http://")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
          lit("Site"), (col("doc_id") % 37).cast("string"), lit(".Example.COM"),
          when(col("doc_id") % 5 === 0, lit(":8080")).otherwise(lit("")),
          lit("/page/"), col("doc_id").cast("string"),
          when(col("doc_id") % 4 === 0, lit("?utm_source=feed&ref=x")).otherwise(lit("")),
          when(col("doc_id") % 6 === 0, lit("#frag")).otherwise(lit(""))).as("url"))
      Sampling.domainCap(wire, col("url"), col("doc_id"), n = 8)
        .select("doc_id", "domain", "rn")
    }),
    // hashed-linear quality classifier (md5 stand-in weights).
    "text_quality_classifier" -> ((s, dir) =>
      TextAnalysis.classifierScore(Tables.documents(s, dir))),
    // the TRAINED variant (round 18): weights learned on this corpus by
    // three fixed rounds of steepest descent with an exact integer line
    // search, target = stopword count. The oracle unrolls the training
    // rounds as CTEs — a hash match proves the full distributed
    // train+score pipeline is bit-replayable.
    "text_quality_classifier_trained" -> ((s, dir) =>
      TextAnalysis.trainedClassifierScore(Tables.documents(s, dir))),
    // the curation pipeline gated by the TRAINED model (round 18): train
    // on the corpus, freeze, gate row-locally inside the same composed
    // plan — the oracle nests the full training replay, so one hash
    // covers train + gate + dedup + decontaminate + mixture + packing.
    "text_curation_trained" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.pipeline.Curation.curate(docs, col("doc_id") % 37 === 0,
        minShared = 40L,
        extraGate = TextAnalysis.frozenClassifierGate(
          TextAnalysis.trainClassifierWeights(docs)))
    }),
    // BPE merge-table trainer (round 18): 8 fixed rounds of the
    // canonical map-reduce pair-count loop over the weighted distinct
    // vocabulary; exact counts + lexicographic tie-breaks, so the
    // oracle replays every round. The encoder below applies the table.
    "text_bpe_vocab" -> ((s, dir) =>
      TextAnalysis.bpeVocab(Tables.documents(s, dir))),
    // per-document subword budget under the trained merges — the real
    // operator the subwordCount run-length proxy stood in for
    "text_bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(Tables.documents(s, dir))),
    // deterministic count-min sketch (4×1024, md5 cells): the
    // approx-frequency sketch that — unlike HLL/KLL — IS fully
    // oracle-checkable, because fixed hashing makes it a pure function
    // of the data. Probes: the stopword list + one absent term.
    "text_countmin" -> ((s, dir) => TextAnalysis.countMinFrequencies(
      Tables.documents(s, dir), TextAnalysis.stopwords :+ "zyzzyva")),
    // context-length chunking: fixed 200-char windows, 150-char stride
    // (overlapping), one row per chunk — row-local fan-out, no shuffle.
    "text_chunk" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, dir))),
    // paragraph-level boilerplate removal over a synthesized multi-
    // paragraph wire corpus: every doc gets a shared header (cased and
    // spaced differently per parity — exercises normalization) + footer,
    // a third get a newsletter banner (all corpus-frequent → dropped at
    // maxFreq=20), a seventh get one of 5 promo-code paragraphs (~14
    // occurrences each → kept), bodies from the real text.
    "text_boilerplate" -> ((s, dir) => {
      val wire = Tables.documents(s, dir).select(col("doc_id"),
        concat_ws("\n\n",
          when(col("doc_id") % 2 === 0, lit("NAV Menu  Home About Contact"))
            .otherwise(lit("nav menu home about contact")),
          substring(col("text"), 1, 80),
          when(col("doc_id") % 3 === 0, lit("Subscribe to our newsletter today")),
          substring(col("text"), 81, 120),
          when(col("doc_id") % 7 === 0,
            concat(lit("promo code "), (col("doc_id") % 5).cast("string"))),
          lit("copyright 2026 example site all rights reserved")).as("text"))
      TextAnalysis.removeBoilerplateParagraphs(wire)
    }),

    // Z-ORDER clustered layout under a two-dimension range filter: write
    // the events projection Morton-clustered on (user_id, hour), read it
    // back under the 2-D filter. Layout must not change CONTENT — the
    // oracle applies the same filter to the original parquet; the
    // bytes-read pruning evidence lives in ZOrderScanSpec/ZOrderProbe.
    "layout_zorder_scan" -> ((s, dir) => {
      val path = s"/tmp/graft-zorder-scan-${new java.io.File(dir).getName}"
      val base = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        expr("ts_ms div 3600000").as("hour"), col("event_type"), col("value"))
      graft.analytics.Layout.writeZOrdered(base, "user_id", "hour", path, 16)
      s.read.parquet(path)
        .filter(col("user_id").between(3, 7)
          && col("hour").between(473500L, 473560L))
    }),

    // ──────────────────────────────────────────── similarity/ANN ──
    "sim_topk_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8))
    }),
    "sim_embed_neardup" -> ((s, dir) =>
      Similarity.embeddingNearDups(Tables.embeddings(s, dir))),
    // label-free near-dup: RHP signature band buckets → exact-cosine
    // verify on candidates only (the non-quadratic unlabeled-corpus path;
    // md5-derived planes → fully oracle-replayable).
    "sim_embed_neardup_lsh" -> ((s, dir) =>
      Similarity.embeddingNearDupsLsh(Tables.embeddings(s, dir))),
    // near-dup clusters + one-survivor-per-cluster selection over the
    // label-free pairs (connected components, endpoints-only iteration).
    "sim_embed_clusters" -> ((s, dir) =>
      Similarity.embeddingClusters(Tables.embeddings(s, dir))),
    "sim_embed_dedup_survivors" -> ((s, dir) =>
      Similarity.embeddingDedupSurvivors(Tables.embeddings(s, dir))
        .select("vec_id", "label")),
    // embedding-level benchmark decontamination: corpus vectors within
    // cosine threshold of any held-out vector (vec_id % 37 = 0 stands in,
    // mirroring text_decontaminate) — broadcast bench bands, map-side probe.
    "sim_embed_decontaminate" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.embeddingDecontaminate(
        emb.filter(col("vec_id") % 37 =!= 0), emb.filter(col("vec_id") % 37 === 0))
    }),
    // contrastive hard negatives: nearest neighbors with a different label.
    "sim_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8))
    }),
    // md5-derived hyperplanes and decimal-summed IVF centroids →
    // both ANN tiers oracle-checked.
    "sim_lsh_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8))
    }),
    "sim_ivf_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8))
    }),
    // label-free IVF: quantizer seeded from an md5-ranked sample of the
    // corpus itself — `label` is DROPPED before the operator ever sees
    // the table, the unlabeled-pretraining-corpus path.
    "sim_ivf_ann_unlabeled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).drop("label")
      Similarity.ivfTopKUnlabeled(emb, emb.filter(col("vec_id") < 8))
    }),
    // SemDeDup: label-free k-means clusters (same trained quantizer as
    // the IVF tier), then within-cluster cosine pruning — the
    // near-linear semantic-dedup shape.
    "sim_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir).drop("label"))),
    // diversity-preserving subsample: ≤32 vectors per trained semantic
    // cluster, md5-ranked — uniform sampling over-represents dense
    // regions; per-cluster quotas keep tail topics.
    "sample_cluster_balanced" -> ((s, dir) =>
      Similarity.clusterBalancedSample(Tables.embeddings(s, dir).drop("label"))),
    // int8 scalar-quantized ANN: corpus-derived per-dim grid, ADC over
    // dequantized codes — the 4×-memory-shrink tier.
    "sim_sq8_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 8))
    }),
    // product-quantized ANN: per-subspace Lloyd codebooks (the shared
    // md5-seeded trainer), 4-byte codes, ADC table scoring — the
    // extreme-compression tier, fully oracle-replayed.
    "sim_pq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).drop("label")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8))
    }),
    // PQ + FAISS-style refine: ADC ranking prunes to the top-40
    // candidates, exact cosines re-rank them — the fix for PQ's
    // resolution limit among near-identical neighbors (the 100× probe
    // measured ADC-only recall@10 = 0.175 on a near-copy-dominated
    // corpus). Candidates broadcast; the corpus still never shuffles.
    "sim_pq_refine_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).drop("label")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8), rerank = 40)
    }),
    // IVF-PQ + refine: the full deployment stack — coarse lists prune,
    // ADC codes rank the survivors, exact cosines re-rank the top-40
    // (FAISS `IVFx,PQy,RFlat`). The 100× recall probe shows this is the
    // only PQ configuration that holds recall on a near-copy-dominated
    // corpus; candidates broadcast, the corpus never shuffles.
    "sim_ivfpq_refine_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).drop("label")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8), rerank = 40)
    }),
    // IVF-PQ: trained coarse lists prune to nprobe lists per query, PQ
    // codes ADC-score the survivors — the composed billion-scale index.
    "sim_ivfpq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).drop("label")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8))
    }),

    // ORC round-trip: the storage schema written to and read back from
    // the second columnar lake format (vectorized scan, same pushdown
    // surface as parquet). Full-table output: every row, type, and
    // timestamp must survive the trip — the oracle reads the original
    // parquet, so any roundtrip corruption hash-fails.
    "source_orc_roundtrip" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      graft.sources.Formats.orcRoundtrip(ord,
        s"/tmp/graft-orc-roundtrip-${new java.io.File(dir).getName}")
    }),

    // JSON-lines roundtrip under a pinned schema (the reference's landing
    // format): oracle reads the ORIGINAL parquet, so any write→read drift
    // (double formatting, null handling, schema inference) hash-fails.
    "source_json_roundtrip" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      graft.sources.Formats.jsonRoundtrip(cust,
        s"/tmp/graft-json-roundtrip-${new java.io.File(dir).getName}")
    }),

    // DSv2 connector smoke: deterministic synthetic source through the
    // public format() surface; md5-derived generator → the oracle
    // regenerates the stream from range(10000).
    "source_dsv2_scan" -> ((s, _) =>
      s.read.format("graft-events").option("rows", 10000).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("decimal(38,2)")
            .cast("double").as("sum_value"))),

    // ──────────────────────────────────────── multimodal columns ──
    "mm_decode" -> ((s, dir) =>
      Multimodal.decodeExpr(Multimodal.syntheticAssets(Tables.documents(s, dir)))),
    // frame sampling runs on RECOVERED frame counts (round 18): the
    // n_frames driving the explode is read back from actual GIF bytes
    // by the real decoder, not derived by id arithmetic
    "mm_frames" -> ((s, dir) => Multimodal.sampleFrames(
      Multimodal.decodeReal(realAssetCorpus(s, dir)).toDF(), step = 4)),
    "mm_resize" -> ((s, dir) => Multimodal.resizePlan(
      Multimodal.decodeExpr(Multimodal.syntheticAssets(Tables.documents(s, dir))))),
    // md5-derived feature seeds over the RECOVERED frames → oracle-checked.
    "mm_features" -> ((s, dir) => Multimodal.frameFeatures(Multimodal.sampleFrames(
      Multimodal.decodeReal(realAssetCorpus(s, dir)).toDF(), step = 4))),

    // REAL pure-JDK codec tier (round 17): the corpus encodes actual
    // PNG (javax.imageio) and RIFF/WAVE PCM bytes whose parameters
    // derive from doc_id in closed form, so the oracle knows the ground
    // truth the decoder must RECOVER from the bytes — a hash match
    // proves a real codec parse, not replayed arithmetic. Video stays
    // on the labeled stub tier above (no JDK video codec).
    "mm_decode_real" -> ((s, dir) =>
      Multimodal.decodeReal(realAssetCorpus(s, dir)).toDF()),
    // real pixel rescale (Graphics2D): output dims + channel means are
    // read back from the RESIZED image, not replayed from the plan
    "mm_resize_real" -> ((s, dir) =>
      Multimodal.resizeReal(realAssetCorpus(s, dir)).toDF()),
    // REAL video (round 18): one row per frame RECOVERED from actual
    // animated-GIF bytes — dims and channel means are read from decoded
    // pixels; the oracle states the planted per-frame truth in closed
    // form, so the hash match proves a real frame-by-frame parse
    "mm_video_real" -> ((s, dir) =>
      Multimodal.decodeVideoReal(realAssetCorpus(s, dir)).toDF()),
    // LOSSY-codec contract (round 19): real ImageIO JPEG decode over
    // the image slice re-encoded lossily, verified by TOLERANCE against
    // the closed-form truth. The query emits the EXACT part — dims
    // (lossless in JPEG) and the within_tol verdict (the bounded error
    // folded into a boolean) — so the driver's hash compare stays
    // exact; max_err stays out of the hash (decoder-dependent). Each
    // asset's exact-PNG twin rides mm_decode_real.
    "mm_decode_jpeg" -> ((s, dir) =>
      Multimodal.decodeJpegVerdict(
          Multimodal.realJpegAssets(Tables.documents(s, dir))).toDF()
        .select(col("asset_id"), col("width"), col("height"),
          col("within_tol"))),

    // Perceptual (block-hash) near-dup over binary payloads. The corpus
    // has no natural byte-level near-identical payloads, so the query
    // PLANTS them — every 20th document gets a copy with one character
    // substituted (same construction in the oracle): a localized edit
    // flips ≤1 block bit, which the 4×16-bit Hamming banding must find.
    "mm_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val mutated = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(substring(col("text"), 1, 9), lit("Z"),
            col("text").substr(lit(11), length(col("text")))).as("text"))
      Multimodal.perceptualNearDups(
        Multimodal.syntheticAssets(docs.unionByName(mutated)))
    }))

  // ────────────────────────────────────────────────── oracle SQL ──

  // Decimal-exact aggregate, surfaced as DOUBLE: every final output column
  // that used to be DECIMAL is cast to DOUBLE on BOTH sides — pyarrow reads
  // parquet DECIMAL as decimal.Decimal while DuckDB's .df() gives float64,
  // so equal values hash differently unless both sides emit float64
  // (round-2 driver verdict, 16 queries).
  //
  // DECIMAL→DOUBLE RULE (round-3 advice): on the DuckDB side every
  // decimal→double cast goes through VARCHAR — CAST(CAST(x AS VARCHAR) AS
  // DOUBLE) — because DuckDB's direct decimal→double casts unscaled→double
  // and divides by 10^scale (double rounding, off by 1 ulp once the
  // unscaled value exceeds 2^53, e.g. DECIMAL(38,6) 9007199254.740993),
  // while its string→double parse is correctly rounded and therefore
  // matches Spark/Java BigDecimal.doubleValue. Verified against DuckDB
  // locally; regression pinned in tools/check_oracle.py selftest.
  private val toksSql = "list_filter(string_split_regex(text, ' +'), t -> len(t) > 0)"

  /** The BPE training rounds as CTE stages (shared by the vocab and
    * encode oracles): round r's CTEs are the pair enumeration over the
    * previous round's symbol strings, the (count desc, lhs, rhs)
    * argmax, and the wire-form `replace` merge — mirroring
    * TextAnalysis.bpeMergeRounds one CTE per stage. The LEFT JOIN ON
    * TRUE makes a pairless round a no-op exactly like the Scala
    * loop's early stop.
    */
  private def bpeRoundsCte(merges: Int): String = {
    val round = (r: Int) => s"""pa$r AS (
      |  SELECT cnt, string_split(substr(s, 2, length(s) - 2), '||') AS a
      |  FROM s${r - 1}),
      |pi$r AS (SELECT cnt, a, unnest(range(1, len(a))) AS i FROM pa$r),
      |b$r AS (
      |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
      |    SELECT list_extract(a, i) AS l, list_extract(a, i + 1) AS r, cnt
      |    FROM pi$r)
      |  GROUP BY l, r ORDER BY c DESC, l, r LIMIT 1),
      |s$r AS (
      |  SELECT w.word, w.cnt,
      |    CASE WHEN b.l IS NULL THEN w.s
      |    ELSE replace(w.s, '|' || b.l || '||' || b.r || '|',
      |                 '|' || b.l || b.r || '|') END AS s
      |  FROM s${r - 1} w LEFT JOIN b$r b ON TRUE)""".stripMargin
    s"""tok AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
      |w AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY t),
      |s0 AS (SELECT word, cnt, regexp_replace(word, '(.)', '|\\1|', 'g') AS s FROM w),
      |${(1 to merges).map(round).mkString(",\n")}""".stripMargin
  }

  private def bpeVocabOracle(merges: Int): String =
    s"""WITH ${bpeRoundsCte(merges)}
      |${(1 to merges).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, l AS lhs, r AS rhs, " +
          s"l || r AS merged, c AS pair_count FROM b$r")
        .mkString("\nUNION ALL\n")}""".stripMargin

  private def bpeEncodeOracle(merges: Int): String =
    s"""WITH ${bpeRoundsCte(merges)},
      |enc AS (
      |  SELECT word,
      |    CAST(len(string_split(substr(s, 2, length(s) - 2), '||')) AS BIGINT) AS n_p
      |  FROM s$merges)
      |SELECT d.doc_id, COALESCE(x.n_tokens, 0) AS n_tokens,
      |  COALESCE(x.n_pieces, 0) AS n_pieces
      |FROM documents d LEFT JOIN (
      |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(enc.n_p) AS BIGINT) AS n_pieces
      |  FROM tok JOIN enc ON tok.t = enc.word GROUP BY tok.doc_id) x
      |USING (doc_id)""".stripMargin

  /** The composed curation oracle, parameterized by an extra SQL
    * predicate spliced into the gated CTE — "" for the heuristic
    * pipeline, the nested trained-classifier keep subquery for the
    * trained variant (one definition, so the two entries cannot
    * drift).
    */
  private def curationOracle(extraGateSql: String): String =
    s"""WITH $bigramShingleCte,
         |t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, source, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE) AS DECIMAL(18,6)) AS stopword_ratio,
         |  ${langScoreSql(Seq("der", "und", "nicht", "das"))} AS s_de,
         |  ${langScoreSql(Seq("the", "and", "not", "this"))} AS s_en,
         |  ${langScoreSql(Seq("el", "los", "que", "este"))} AS s_es,
         |  ${langScoreSql(Seq("le", "les", "que", "ce"))} AS s_fr,
         |  ${langScoreSql(Seq("de", "shi", "bu", "zhe"))} AS s_zh
         | FROM t),
         |rep AS (
         |  SELECT doc_id, max(c) AS top_bi
         |  FROM (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id,
         |                unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
         |              FROM t WHERE len(toks) >= 2)
         |        GROUP BY doc_id, g)
         |  GROUP BY doc_id),
         |g AS (SELECT s.doc_id, source, text, n_tokens, stopword_ratio,
         |  CAST(CASE WHEN n_tokens > 1
         |    THEN CAST(coalesce(rep.top_bi, 0) AS DOUBLE) / CAST(n_tokens - 1 AS DOUBLE)
         |    ELSE 0 END AS DECIMAL(18,6)) AS top_bigram_frac,
         |  CASE
         |    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |    ELSE 'zh' END AS lang_pred
         | FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id),
         |gated AS (
         |  SELECT * FROM g
         |  WHERE n_tokens >= 10 AND stopword_ratio <= 0.5
         |    AND top_bigram_frac <= 0.1 AND lang_pred != 'und'
         |    AND doc_id % 37 != 0$extraGateSql),
         |surv AS (
         |  SELECT doc_id, source, lang_pred, n_tokens, stopword_ratio, top_bigram_frac
         |  FROM gated
         |  QUALIFY row_number() OVER (
         |    PARTITION BY md5(regexp_replace(lower(text), ' +', ' ', 'g'))
         |    ORDER BY doc_id) = 1),
         |ngx AS (SELECT doc_id, doc_id % 37 = 0 AS is_bench, unnest(sh) AS ng FROM sh),
         |bench AS (SELECT DISTINCT ng FROM ngx WHERE is_bench),
         |flagged AS (
         |  SELECT doc_id FROM ngx JOIN bench USING (ng)
         |  WHERE NOT is_bench GROUP BY doc_id HAVING count(DISTINCT ng) >= 40),
         |clean AS (
         |  SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
         |cnt AS (SELECT lang_pred AS mix_g, count(*) AS n_g FROM clean GROUP BY lang_pred),
         |r AS (SELECT mix_g, sqrt(CAST((SELECT min(n_g) FROM cnt) AS DOUBLE) / CAST(n_g AS DOUBLE)) AS rate FROM cnt),
         |mixed AS (
         |  SELECT clean.*, rate FROM clean JOIN r ON clean.lang_pred = r.mix_g
         |  WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |    / 4294967296.0 < rate),
         |packed AS (
         |  SELECT doc_id, source, lang_pred, n_tokens, stopword_ratio, top_bigram_frac, rate,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM mixed)
         |SELECT doc_id, source, lang_pred, n_tokens,
         |  CAST(CAST(stopword_ratio AS VARCHAR) AS DOUBLE) AS stopword_ratio,
         |  CAST(CAST(top_bigram_frac AS VARCHAR) AS DOUBLE) AS top_bigram_frac,
         |  CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS sample_rate,
         |  cum_before, cum_before // 2048 AS seq_idx, cum_before % 2048 AS seq_offset
         |FROM packed""".stripMargin

  /** The trained-classifier oracle: `rounds` steepest-descent rounds
    * (exact line search — see TextAnalysis.trainedClassifierScore)
    * unrolled mechanically as CTE stages, mirroring the Scala fold one
    * stage per round. d=256 buckets, scale=U=1e6, threshold 0.08 —
    * the operator's defaults.
    */
  private def trainedClassifierOracle(rounds: Int): String = {
    val round = (r: Int) => s"""res$r AS (
      |  SELECT f.doc_id,
      |    CAST(1000000 * any_value(l.t) - sum(f.c * w.w) AS BIGINT) AS r
      |  FROM feat f JOIN w${r - 1} w USING (b) JOIN lab l USING (doc_id)
      |  GROUP BY f.doc_id),
      |g$r AS (
      |  SELECT f.b, sum(CAST(res.r AS HUGEINT) * f.c) AS g
      |  FROM feat f JOIN res$r res USING (doc_id) GROUP BY f.b),
      |gm$r AS (SELECT max(abs(g)) AS gmax FROM g$r),
      |u$r AS (
      |  SELECT b, CAST(COALESCE((g * 1000000) // nullif(gmax, 0), 0) AS BIGINT) AS u
      |  FROM g$r, gm$r),
      |xu$r AS (
      |  SELECT f.doc_id, CAST(sum(f.c * u.u) AS BIGINT) AS xu
      |  FROM feat f JOIN u$r u USING (b) GROUP BY f.doc_id),
      |ab$r AS (
      |  SELECT CAST(COALESCE(
      |    (sum(CAST(res.r AS HUGEINT) * xu.xu) * 1000000)
      |      // nullif(sum(CAST(xu.xu AS HUGEINT) * xu.xu), 0), 0) AS BIGINT) AS a
      |  FROM xu$r xu JOIN res$r res USING (doc_id)),
      |w$r AS (
      |  SELECT w.b, w.w + CAST((ab.a * CAST(u.u AS HUGEINT)) // 1000000 AS BIGINT) AS w
      |  FROM w${r - 1} w JOIN u$r u USING (b), ab$r ab)""".stripMargin
    s"""WITH tok AS (
      |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |    CAST(CONCAT('0x', substr(md5('qcls-' || t), 1, 15)) AS BIGINT) % 256 AS b,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY doc_id, b),
      |lab AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN list_contains(['the','a','of','and','to','in','is','it'], t) THEN 1 ELSE 0 END) AS BIGINT) AS t
      |  FROM tok GROUP BY doc_id),
      |w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM feat),
      |${(1 to rounds).map(round).mkString(",\n")},
      |predT AS (
      |  SELECT f.doc_id, CAST(sum(f.c * w.w) AS BIGINT) AS p
      |  FROM feat f JOIN w$rounds w USING (b) GROUP BY f.doc_id)
      |SELECT d.doc_id,
      |  COALESCE(l.n, 0) AS n_tokens,
      |  CAST(CAST(CASE WHEN l.n > 0
      |    THEN CAST(p.p AS DOUBLE) / CAST(l.n * 1000000 AS DOUBLE) END
      |    AS DECIMAL(18,6)) AS DOUBLE) AS score,
      |  COALESCE(CAST(CAST(CASE WHEN l.n > 0
      |    THEN CAST(p.p AS DOUBLE) / CAST(l.n * 1000000 AS DOUBLE) END
      |    AS DECIMAL(18,6)) AS DOUBLE) > 0.08, FALSE) AS keep
      |FROM documents d
      |LEFT JOIN lab l USING (doc_id)
      |LEFT JOIN predT p USING (doc_id)""".stripMargin
  }

  /** Distinct word-bigram shingles per document — the DuckDB twin of
    * `Dedup.shingles(text, 2)` (VecText.WordShingles semantics, including
    * the <2-token whole-text fallback). Shared by the jaccard, cluster and
    * decontamination oracles.
    */
  private val bigramShingleCte =
    s"""sh AS (
       |  SELECT doc_id, n_chars,
       |    CASE WHEN len(toks) >= 2
       |      THEN list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))
       |      ELSE [array_to_string(toks, ' ')] END AS sh
       |  FROM (SELECT doc_id, n_chars, $toksSql AS toks FROM documents)
       |)""".stripMargin

  /** Banded-minhash candidate pairs (64 perms, 16 bands of 4) — the
    * DuckDB twin of `Dedup.minhashCandidates`, ending at the `mcand`
    * CTE. Shared by the jaccard-verified (`dedup_minhash`) and
    * levenshtein-verified (`dedup_editdist`) oracles. Expects
    * `bigramShingleCte` in scope.
    */
  private val minhashCandSql =
    """hx AS (
      |  SELECT doc_id, CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
      |), perm AS (
      |  SELECT i,
      |    1 + CAST(CONCAT('0x', substr(md5('minhash-a-' || i), 1, 15)) AS BIGINT)
      |      % 2305843009213693950 AS a,
      |    CAST(CONCAT('0x', substr(md5('minhash-b-' || i), 1, 15)) AS BIGINT)
      |      % 2305843009213693951 AS b
      |  FROM range(64) t(i)
      |), sv AS (
      |  SELECT doc_id, i,
      |    min(CAST((CAST(a AS HUGEINT) * h + b) % 2305843009213693951 AS BIGINT)) AS v
      |  FROM hx CROSS JOIN perm GROUP BY doc_id, i
      |), sig AS (
      |  SELECT doc_id, list(v ORDER BY i) AS sig FROM sv GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1 : b*4+4], ',') AS bucket
      |  FROM sig CROSS JOIN range(16) t(b)
      |), mcand AS (
      |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      |)""".stripMargin

  /** Length-blocked candidate pairs + exact Jaccard score — the DuckDB
    * twin of `Dedup.blockedJaccardPairs` minus the final threshold/cast.
    */
  private val jaccardScoredCtes =
    """bk AS (
      |  SELECT doc_id, unnest(list_distinct([n_chars // 64, (n_chars + 32) // 64])) AS bucket FROM sh
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      |), scored AS (
      |  SELECT c.doc_id_a, c.doc_id_b,
      |    CAST(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
      |      / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) AS DECIMAL(18,6)) AS jaccard
      |  FROM cand c JOIN sh x ON c.doc_id_a = x.doc_id JOIN sh y ON c.doc_id_b = y.doc_id
      |)""".stripMargin

  /** Per-language marker-hit score; mirrors TextAnalysis.langMarkers. */
  private def langScoreSql(markers: Seq[String]): String =
    s"len(list_filter(toks, x -> list_contains([${markers.map("'" + _ + "'").mkString(",")}], x)))"

  // ── IVF/k-means oracle building blocks (Similarity.ivfTopK twins) ──

  /** Sequential-order double cosine of two list columns. */
  private def ivfCosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
       |         * sqrt(list_sum(list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))""".stripMargin

  /** Decimal-sum centroid of `src` rows (centroid_id, embedding) —
    * the DuckDB twin of Similarity.decimalSumCentroids (float→VARCHAR→
    * DECIMAL(18,9) per element, exact sum, VARCHAR-routed double out).
    */
  private def ivfCentroidSql(src: String): String =
    s"""SELECT centroid_id, list(vd ORDER BY pos) AS centroid
       |  FROM (SELECT centroid_id, pos, CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) AS vd
       |        FROM (SELECT centroid_id, z[2] AS pos, CAST(CAST(z[1] AS VARCHAR) AS DECIMAL(18,9)) AS v
       |              FROM (SELECT centroid_id, unnest(list_zip(embedding, range(1, len(embedding) + 1))) AS z
       |                    FROM $src))
       |        GROUP BY centroid_id, pos)
       |  GROUP BY centroid_id""".stripMargin

  /** RHP signature/banding stages (the DuckDB twin of
    * Similarity.rhpSignature + 8×8-bit banding over the embeddings
    * table): the 64 hyperplanes regenerate from md5("rhp-p-i"); `bands`
    * holds one (vec_id, band, bucket) row per vector per band, `e` the
    * vectors with precomputed norms.
    */
  private val rhpSigCtes =
    """pl AS (
      |  SELECT p, list(CAST(CAST(CONCAT('0x', substr(md5('rhp-' || p || '-' || i), 1, 15)) AS BIGINT)
      |      % 1000000 AS DOUBLE) / 1000000.0 - 0.5 ORDER BY i) AS w
      |  FROM range(64) tp(p) CROSS JOIN range(64) ti(i)
      |  GROUP BY p
      |), e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |), sigb AS (
      |  SELECT vec_id, p,
      |    list_sum(list_transform(range(1, len(embedding) + 1),
      |      i -> CAST(embedding[i] AS DOUBLE) * w[i])) AS dotp
      |  FROM embeddings CROSS JOIN pl
      |), sig AS (
      |  SELECT vec_id, sum(CASE WHEN dotp > 0 THEN CAST(1 AS HUGEINT) << p ELSE 0 END) AS usig
      |  FROM sigb GROUP BY vec_id
      |), bands AS (
      |  SELECT vec_id, band, CAST((usig >> (8 * band)) % 256 AS BIGINT) AS bucket
      |  FROM sig CROSS JOIN range(8) tb(band)
      |)""".stripMargin

  /** RHP-LSH near-dup pair stages (Similarity.embeddingNearDupsLsh up to
    * its `scored` output) — shared by the pair, cluster and survivor
    * oracles. `scored` holds every candidate pair with its exact
    * sequential-order cosine, pre-threshold.
    */
  private val rhpNearDupCtes =
    s"""$rhpSigCtes, cand AS (
      |  SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      |), scored AS (
      |  SELECT vec_id_a, vec_id_b,
      |    list_sum(list_transform(list_zip(x.embedding, y.embedding),
      |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (x.nrm * y.nrm) AS cos
      |  FROM cand JOIN e x ON cand.vec_id_a = x.vec_id JOIN e y ON cand.vec_id_b = y.vec_id
      |)""".stripMargin

  /** Nearest-centroid assignment of every corpus vector against `cent` —
    * the DuckDB twin of Similarity.assignToCentroids.
    */
  private def ivfAssignSql(cent: String): String =
    s"""SELECT vec_id, embedding, centroid_id
       |  FROM (SELECT e.vec_id, e.embedding, c.centroid_id,
       |          ${ivfCosSql("e.embedding", "c.centroid")} AS d
       |        FROM embeddings e CROSS JOIN $cent c)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, centroid_id) = 1""".stripMargin

  /** Decimal MEAN centroid of `src` rows — the DuckDB twin of
    * Similarity.decimalMeanCentroids (PQ codebooks need magnitude-
    * faithful means; the division runs in double on both engines).
    */
  private def pqMeanCentroidSql(src: String): String =
    s"""SELECT centroid_id, list(vd ORDER BY pos) AS centroid
       |  FROM (SELECT centroid_id, pos, CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) / count(*) AS vd
       |        FROM (SELECT centroid_id, z[2] AS pos, CAST(CAST(z[1] AS VARCHAR) AS DECIMAL(18,9)) AS v
       |              FROM (SELECT centroid_id, unnest(list_zip(embedding, range(1, len(embedding) + 1))) AS z
       |                    FROM $src))
       |        GROUP BY centroid_id, pos)
       |  GROUP BY centroid_id""".stripMargin

  /** [[ivfAssignSql]] over the [lo,hi] sub-vector slice — the per-
    * subspace assignment of the PQ oracle (DuckDB list slices are
    * 1-based inclusive, mirroring Spark's `slice(col, lo, len)`).
    */
  private def pqAssignSql(cent: String, lo: Int, hi: Int): String =
    s"""SELECT vec_id, embedding, centroid_id
       |  FROM (SELECT e.vec_id, e.embedding[$lo:$hi] AS embedding, c.centroid_id,
       |          ${ivfCosSql(s"e.embedding[$lo:$hi]", "c.centroid")} AS d
       |        FROM embeddings e CROSS JOIN $cent c)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, centroid_id) = 1""".stripMargin

  /** The full PQ oracle: per-subspace md5-seeded decimal-sum Lloyd
    * training unrolled exactly like the IVF oracles (2 rounds), codes
    * from the final per-subspace assignment, ADC scoring with explicit
    * left-to-right sums over subspaces so no engine-divergent reduction
    * order exists anywhere.
    */
  /** Per-subspace PQ training CTEs (seed slice → unrolled Lloyd →
    * mean codebook → codes) — shared by the PQ and IVF-PQ oracles.
    */
  private def pqSubCtes(numSub: Int, subDim: Int): String =
    (0 until numSub).map { m =>
      val (lo, hi) = (m * subDim + 1, m * subDim + subDim)
      s"""cent0_$m AS (
         |  ${ivfCentroidSql(s"(SELECT centroid_id, embedding[$lo:$hi] AS embedding FROM seeds)")}
         |), asn1_$m AS (
         |  ${pqAssignSql(s"cent0_$m", lo, hi)}
         |), cent1_$m AS (
         |  ${ivfCentroidSql(s"asn1_$m")}
         |), asn2_$m AS (
         |  ${pqAssignSql(s"cent1_$m", lo, hi)}
         |), book_$m AS (
         |  ${pqMeanCentroidSql(s"asn2_$m")}
         |), codes_$m AS (
         |  SELECT vec_id, centroid_id AS code FROM (${pqAssignSql(s"book_$m", lo, hi)})
         |)""".stripMargin
    }.mkString(", ")

  /** The ADC cosine expression over joined codes/books — explicit
    * left-to-right sums so no engine-divergent reduction order exists.
    */
  private def pqAdcCosSql(numSub: Int, subDim: Int): String = {
    val dotTerms = (0 until numSub).map { m =>
      val (lo, hi) = (m * subDim + 1, m * subDim + subDim)
      s"""list_sum(list_transform(list_zip(qq.embedding[$lo:$hi], k$m.centroid),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))""".stripMargin
    }
    val nTerms = (0 until numSub).map(m =>
      s"list_sum(list_transform(k$m.centroid, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    s"""(${dotTerms.mkString("\n     + ")})
       |    / (qq.qn * sqrt(${nTerms.mkString(" + ")}))""".stripMargin
  }

  private def pqCodeJoins(numSub: Int): String =
    (0 until numSub).map(m =>
      s"JOIN codes_$m z$m ON c.vec_id = z$m.vec_id JOIN book_$m k$m ON z$m.code = k$m.centroid_id")
      .mkString("\n    ")

  private val pqQqCte =
    """qq AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS qn
      |  FROM embeddings WHERE vec_id < 8
      |)""".stripMargin

  private val pqTopKSelect =
    """SELECT query_id,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
      |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
      |FROM scored QUALIFY rnk <= 5""".stripMargin

  private def pqOracleSql(numSub: Int = 4, subDim: Int = 16, subK: Int = 16): String =
    s"""WITH seeds AS (
       |  SELECT vec_id AS centroid_id, embedding FROM embeddings
       |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $subK
       |), ${pqSubCtes(numSub, subDim)}, $pqQqCte, scored AS (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${pqAdcCosSql(numSub, subDim)} AS cos
       |  FROM embeddings c
       |    ${pqCodeJoins(numSub)}
       |    CROSS JOIN qq
       |  WHERE qq.vec_id != c.vec_id
       |)
       |$pqTopKSelect""".stripMargin

  /** Fixed-point PageRank oracle: the same integer floor-arithmetic
    * iterations as [[GraphAnalytics.supplierCustomerPageRank]], unrolled
    * as CTEs (the Lloyd-unroll pattern). DuckDB `//` and Spark `div`
    * both floor on positive longs; `sum(BIGINT)` is HUGEINT in DuckDB,
    * so the per-iteration mass is cast back to BIGINT (values stay far
    * below 2^63 by construction: total mass ≤ 1e12, ×85 ≤ 8.5e13).
    */
  private def pageRankOracleSql(iters: Int = 3): String = {
    val its = (1 to iters).map { k =>
      s"""it$k AS (
         |  SELECT e.dst AS id, CAST(sum(p.pr // d.deg) AS BIGINT) AS m
         |  FROM edges e JOIN pr${k - 1} p ON e.src = p.id JOIN deg d ON e.src = d.id
         |  GROUP BY 1
         |), pr$k AS (
         |  SELECT id, CAST((150000000000 // n) + ((m * 85) // 100) AS BIGINT) AS pr
         |  FROM it$k, nn
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000000000 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |), edges AS (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
       |), deg AS (
       |  SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1
       |), nn AS (
       |  SELECT count(*) AS n FROM deg
       |), pr0 AS (
       |  SELECT id, CAST(1000000000000 // n AS BIGINT) AS pr FROM deg, nn
       |), $its
       |SELECT id AS node_id, pr FROM pr$iters""".stripMargin
  }

  /** PQ + refine oracle: the [[pqOracleSql]] ADC ranking prunes to the
    * top-`rerank` candidates per query; exact sequential-order cosines
    * (the [[Similarity.bruteForceTopK]] formulation) re-rank them. ADC
    * cosines are bit-identical per pair, so the rank-`rerank` cut is
    * engine-identical, not just the top-k.
    */
  private def pqRefineOracleSql(rerank: Int, numSub: Int = 4, subDim: Int = 16,
      subK: Int = 16): String =
    s"""WITH seeds AS (
       |  SELECT vec_id AS centroid_id, embedding FROM embeddings
       |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $subK
       |), ${pqSubCtes(numSub, subDim)}, $pqQqCte, adc AS (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${pqAdcCosSql(numSub, subDim)} AS cos
       |  FROM embeddings c
       |    ${pqCodeJoins(numSub)}
       |    CROSS JOIN qq
       |  WHERE qq.vec_id != c.vec_id
       |), cand AS (
       |  SELECT query_id, neighbor_id FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= $rerank
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_sum(list_transform(list_zip(qq.embedding, c.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |    / (qq.qn * sqrt(list_sum(list_transform(c.embedding,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
       |  FROM cand JOIN embeddings c ON cand.neighbor_id = c.vec_id
       |            JOIN qq ON cand.query_id = qq.vec_id
       |)
       |$pqTopKSelect""".stripMargin

  /** IVF-PQ oracle: the unlabeled IVF coarse training (cseeds/ccent*)
    * prunes to nprobe lists per query; PQ codes score the survivors.
    * Every stage reuses the proven IVF/PQ CTE generators. With
    * `rerank > 0` the ADC ranking over the probed lists further prunes
    * to the top-`rerank` candidates and exact cosines re-rank them —
    * the FAISS `IVFx,PQy,RFlat` shape, the configuration the 100×
    * recall probe shows is what you'd actually deploy (SURVEY §12).
    */
  private def ivfPqOracleSql(numSub: Int = 4, subDim: Int = 16, subK: Int = 16,
      coarseK: Int = 8, nprobe: Int = 2, rerank: Int = 0): String = {
    def cAssign(cent: String): String = ivfAssignSql(cent)
    s"""WITH seeds AS (
       |  SELECT vec_id AS centroid_id, embedding FROM embeddings
       |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $subK
       |), cseeds AS (
       |  SELECT vec_id AS centroid_id, embedding FROM embeddings
       |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $coarseK
       |), ccent0 AS (
       |  ${ivfCentroidSql("cseeds")}
       |), casn1 AS (
       |  ${cAssign("ccent0")}
       |), ccent1 AS (
       |  ${ivfCentroidSql("casn1")}
       |), casn2 AS (
       |  ${cAssign("ccent1")}
       |), ccent2 AS (
       |  ${ivfCentroidSql("casn2")}
       |), lists AS (
       |  SELECT vec_id, centroid_id AS list_id FROM (${cAssign("ccent2")})
       |), ${pqSubCtes(numSub, subDim)}, $pqQqCte, probes AS (
       |  SELECT vec_id AS query_id, centroid_id AS list_id
       |  FROM (
       |    SELECT e.vec_id, c.centroid_id,
       |      ${ivfCosSql("e.embedding", "c.centroid")} AS d
       |    FROM embeddings e CROSS JOIN ccent2 c WHERE e.vec_id < 8)
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, centroid_id) <= $nprobe
       |), ${if (rerank > 0) "adc" else "scored"} AS (
       |  SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${pqAdcCosSql(numSub, subDim)} AS cos
       |  FROM embeddings c
       |    ${pqCodeJoins(numSub)}
       |    JOIN lists l ON c.vec_id = l.vec_id
       |    JOIN probes p ON p.list_id = l.list_id
       |    JOIN qq ON qq.vec_id = p.query_id
       |  WHERE qq.vec_id != c.vec_id
       |)${if (rerank > 0) s""", cand AS (
       |  SELECT query_id, neighbor_id FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= $rerank
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_sum(list_transform(list_zip(qq.embedding, c.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |    / (qq.qn * sqrt(list_sum(list_transform(c.embedding,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
       |  FROM cand JOIN embeddings c ON cand.neighbor_id = c.vec_id
       |            JOIN qq ON cand.query_id = qq.vec_id
       |)""" else ""}
       |$pqTopKSelect""".stripMargin
  }

  /** Queries that are BY CONSTRUCTION rows-only checked: their result
    * content is an engine-specific sketch internal (HLL register sums /
    * KLL compactor choices) that no portable ANSI SQL reproduces, so
    * `oracleSql` deliberately omits them and each has a hash-green
    * exact twin covering the same data path (`q_distinct_agg`,
    * `q_median`). Declared machine-readably so a correctness artifact
    * can report them as `rows_only` instead of a failure-shaped
    * `no_oracle` error (Verify writes them to verify_meta.json).
    * VerifyJsonSpec pins: this set is EXACTLY queries ∖ oracleSql — a
    * new query silently missing its oracle fails the spec instead of
    * shipping unchecked.
    */
  val rowsOnly: Set[String] = Set("q_approx_distinct", "q_approx_quantiles")

  lazy val oracleSql: Map[String, String] = Map(
    "etl_pipeline" ->
      s"""SELECT ID AS id, HouseNum AS house_number, Street AS street_address,
         | Town AS town, Zip AS zip
         |FROM read_csv('$AddressCsv', header=true, all_varchar=true)""".stripMargin,

    "etl_pipeline_scale" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name,
        | CAST(c_nationkey AS VARCHAR) AS nation, c_mktsegment AS mktsegment
        |FROM customer""".stripMargin,

    "etl_route_transform" ->
      "SELECT event_id, user_id FROM events WHERE event_type IN ('click','view')",

    "etl_route_matchers" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE (event_type LIKE 'cl%' OR regexp_matches(event_type, '^v.*w$')
        |       OR event_type = 'purchase')
        |  AND (CAST(value AS DOUBLE) > 2.0 AND CAST(value AS DOUBLE) <= 75.0)
        |  AND props IS NOT NULL
        |  AND (json_extract_string(props, '$.k') IS NOT NULL
        |       AND json_extract_string(props, '$.k') NOT IN ('13','17','29'))""".stripMargin,

    "etl_upsert_lww" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "etl_upsert_bucketed" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // the SQL facade must change nothing about the resolve
    "etl_table_facade" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // deleted keys leave the resolved read and a replayed older wave
    // cannot resurrect them: the live-keys-only LWW is the whole answer
    "etl_upsert_delete" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |WHERE user_id % 7 <> 0
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // the write facade must change nothing about the resolve either
    "etl_table_write" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // the SQL delete verb must agree with the Scala delete API: deleted
    // keys leave the resolve, the replayed wave cannot resurrect them
    "etl_table_delete" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |WHERE user_id % 7 <> 0
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // DELETE WHERE: keys whose full-set LWW winner matches the
    // predicate leave the resolve; the replayed even wave (strictly
    // older than every tombstone by construction) cannot resurrect them
    "etl_table_delete_where" ->
      """SELECT user_id, last_event_id, last_event_type, last_ts_ms
        |FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |   epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |WHERE NOT (last_event_type = 'click' AND last_event_id % 2 = 1)""".stripMargin,

    // UPDATE WHERE: matched winners carry the SET transformation, the
    // replayed even wave (strictly older than every rewritten image by
    // construction) reverts nothing
    "etl_table_update_where" ->
      """SELECT user_id, last_event_id,
        | CASE WHEN last_event_type = 'error' AND last_event_id % 2 = 1
        |   THEN 'err_rev' ELSE last_event_type END AS last_event_type,
        | CASE WHEN last_event_type = 'error' AND last_event_id % 2 = 1
        |   THEN last_ts_ms + 1 ELSE last_ts_ms END AS last_ts_ms
        |FROM (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |   epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)""".stripMargin,

    // bucket pruning must lose no version-row of a pinned key: the
    // pruned facade read equals the from-scratch LWW of the same subset
    "etl_table_pruned" ->
      (s"""SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |WHERE user_id IN (${(0L until 64L).mkString(",")})
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""").stripMargin,

    // the declarative mirror must be exact — same LWW as its upstream
    "etl_upsert_stream_sink" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "etl_upsert_atomic" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "etl_upsert_delta" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // the resize is physical-only: the resolved table equals the LWW
    "etl_upsert_rebucket" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // rows of the full LWW that are NOT identical in the even-batch-only
    // LWW — exactly what committing the odd batch changed
    "etl_upsert_changes" ->
      """WITH lww AS (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |   epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |), lww_even AS (
        |  SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |   epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events WHERE event_id % 2 = 0
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |SELECT * FROM lww EXCEPT SELECT * FROM lww_even""".stripMargin,

    // the maintained view must equal the group-by over the FINAL LWW
    // state (HUGEINT sums cast back to the engine's exact long type)
    "etl_view_incremental" ->
      """WITH resolved AS (
        |  SELECT event_type, epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |SELECT event_type AS last_event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(last_ts_ms % 86400000) AS BIGINT) AS sum_ts_day,
        |  CAST(min(last_ts_ms % 86400000) AS BIGINT) AS min_ts_day,
        |  CAST(max(last_ts_ms % 86400000) AS BIGINT) AS max_ts_day,
        |  CAST(count(DISTINCT last_ts_ms % 86400000 // 3600000) AS BIGINT) AS nd_hour
        |FROM resolved GROUP BY 1""".stripMargin,

    // the STREAMED maintenance pipeline must land on the identical
    // recompute — same oracle as the manually-refreshed view
    "etl_view_stream" ->
      """WITH resolved AS (
        |  SELECT event_type, epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |SELECT event_type AS last_event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(last_ts_ms % 86400000) AS BIGINT) AS sum_ts_day,
        |  CAST(min(last_ts_ms % 86400000) AS BIGINT) AS min_ts_day,
        |  CAST(max(last_ts_ms % 86400000) AS BIGINT) AS max_ts_day,
        |  CAST(count(DISTINCT last_ts_ms % 86400000 // 3600000) AS BIGINT) AS nd_hour
        |FROM resolved GROUP BY 1""".stripMargin,

    // SUB-VERSION slicing must change nothing about the answer: the
    // sliced maintenance stream lands on the same recompute
    "etl_view_stream_sliced" ->
      """WITH resolved AS (
        |  SELECT event_type, epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |SELECT event_type AS last_event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(last_ts_ms % 86400000) AS BIGINT) AS sum_ts_day,
        |  CAST(min(last_ts_ms % 86400000) AS BIGINT) AS min_ts_day,
        |  CAST(max(last_ts_ms % 86400000) AS BIGINT) AS max_ts_day,
        |  CAST(count(DISTINCT last_ts_ms % 86400000 // 3600000) AS BIGINT) AS nd_hour
        |FROM resolved GROUP BY 1""".stripMargin,

    // widen-with-nulls: winners from the pre-widening batch (even
    // event_ids) read null in the added column
    "etl_upsert_evolve" ->
      """SELECT user_id, event_id AS last_event_id,
        |  CASE WHEN event_id % 2 = 1 THEN event_type END AS last_event_type
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    // maintained exact moments → stddev on read must equal the
    // from-scratch recompute (q_stats' exact-integer → one-double-cast
    // discipline on both engines)
    "etl_view_stats" ->
      """WITH resolved AS (
        |  SELECT event_type, epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |), f AS (
        |  SELECT event_type, last_ts_ms % 86400000 AS x FROM resolved
        |), s AS (
        |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx
        |  FROM f GROUP BY 1
        |), d AS (
        |  SELECT event_type, n,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
        |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx
        |  FROM s)
        |SELECT event_type AS last_event_type, CAST(n AS BIGINT) AS n_users,
        |  CAST(CAST(CAST(CASE WHEN n > 1 THEN
        |    sqrt(greatest(dxx - pow(dx, 2) / n, 0) / (n - 1))
        |  END AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS stddev_ts_day
        |FROM d""".stripMargin,

    // the steady-state pass redelivers an already-committed wave (LWW
    // no-op), so the maintained view still equals the same recompute
    "etl_view_refresh" ->
      """WITH resolved AS (
        |  SELECT event_type, epoch_us(ts)//1000 AS last_ts_ms
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |)
        |SELECT event_type AS last_event_type,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(last_ts_ms % 86400000) AS BIGINT) AS sum_ts_day,
        |  CAST(min(last_ts_ms % 86400000) AS BIGINT) AS min_ts_day,
        |  CAST(max(last_ts_ms % 86400000) AS BIGINT) AS max_ts_day,
        |  CAST(count(DISTINCT last_ts_ms % 86400000 // 3600000) AS BIGINT) AS nd_hour
        |FROM resolved GROUP BY 1""".stripMargin,

    "etl_upsert_lookup" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |WHERE user_id % 17 = 0
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "etl_upsert_optimistic" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | epoch_us(ts)//1000 AS last_ts_ms
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "etl_audit_tally" ->
      """SELECT 'extract' AS stage, count(*) AS n FROM customer
        |UNION ALL SELECT 'transform' AS stage, count(*) AS n FROM customer
        |ORDER BY stage""".stripMargin,

    "etl_zip_naive" ->
      "SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name FROM customer",

    "etl_wire_roundtrip" ->
      "SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name FROM customer",

    // Exact ×100 fixed-point mirror of the Spark formulation (DuckDB
    // sums are exact HUGEINT; same exact integers → same doubles).
    "q1_agg" ->
      """WITH f AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qf,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yf,
        |    100 - CAST(round(l_discount * 100) AS BIGINT) AS dfac
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'),
        |s AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |    sum(qf) AS sq, sum(yf) AS sy, sum(yf * dfac) AS sp
        |  FROM f GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus,
        | CAST(CAST(sq AS VARCHAR) AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 100.0 AS sum_base_price,
        | CAST(CAST(sp AS VARCHAR) AS DOUBLE) / 10000.0 AS sum_disc_price,
        | count_order
        |FROM s""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey, orderdate, CAST(CAST(s AS VARCHAR) AS DOUBLE) / 10000.0 AS revenue FROM (
        |  SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS s
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1999-01-01'
        |    AND l_shipdate > TIMESTAMP '1999-01-01'
        |  GROUP BY l_orderkey, orderdate
        |  ORDER BY s DESC, l_orderkey LIMIT 10)""".stripMargin,

    "q5_join" ->
      s"""SELECT n_name, r_name,
         | CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS VARCHAR) AS DOUBLE)
         |   / 10000.0 AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name, r_name""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
        | o_orderkey, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS totalprice
        |FROM orders QUALIFY rnk <= 3""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_custkey,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
        | o_orderkey, CAST(CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS totalprice
        |FROM orders QUALIFY rnk <= 3""".stripMargin,

    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey < 5""".stripMargin,

    // RANGE frame over a day number: the frame sum is an exact LONG in
    // cents, cast once (< 2^53, exact both engines); 100.0 forced
    // ::DOUBLE (DuckDB parses bare decimals as DECIMAL).
    "q_window_range" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  CAST(CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        |    / 100.0::DOUBLE AS rev30
        |FROM o""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100.0 AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100.0 AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_pagerank" -> pageRankOracleSql(),

    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS VARCHAR) AS DOUBLE) / 100.0 AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin,

    "events_asof_join" ->
      """SELECT a.event_id, a.user_id, epoch_us(a.ts)//1000 AS ts_ms,
        | b.event_id AS asof_event_id, epoch_us(b.ts)//1000 AS asof_ts_ms
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND epoch_us(a.ts) >= epoch_us(b.ts)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

    "q_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity > 48)""".stripMargin,

    // deliberately the PLAIN join: the Spark side salts, the oracle does
    // not — the hash match is the proof the salting is result-invisible.
    "q_skew_join" ->
      """SELECT p_brand,
        | CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS VARCHAR) AS DOUBLE)
        |   / 10000.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        | count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "events_tally" ->
      """SELECT event_type, count(*) AS n,
        | min(epoch_us(ts)//1000) AS first_ts_ms, max(epoch_us(ts)//1000) AS last_ts_ms
        |FROM events GROUP BY event_type""".stripMargin,

    "events_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, epoch_us(ts)//1000 AS ts_ms,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), sess AS (
        |  SELECT user_id, ts_ms,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    // overlap join replayed as the plain predicate join (the grid
    // bucketing + emit-once rule is pure plumbing — same pair set);
    // bursts/sessions rebuilt with the lag/cumsum recipe above.
    "events_interval_join" ->
      """WITH em AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts)//1000 AS ts_ms,
        |    epoch_us(ts) AS ts_us
        |  FROM events
        |), bm AS (
        |  SELECT ts_ms, event_id,
        |    CASE WHEN lag(ts_ms) OVER w IS NULL
        |           OR ts_ms - lag(ts_ms) OVER w > 600000 THEN 1 ELSE 0 END AS nb
        |  FROM em WHERE event_type = 'error'
        |  WINDOW w AS (ORDER BY ts_ms, event_id)
        |), bursts AS (
        |  SELECT CAST(sum(nb) OVER (ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS burst_id, ts_ms
        |  FROM bm
        |), bi AS (
        |  SELECT burst_id, min(ts_ms) AS lo, max(ts_ms) AS hi FROM bursts GROUP BY 1
        |), sm AS (
        |  SELECT user_id, ts_ms,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns,
        |    ts_us, event_id
        |  FROM em
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), sess AS (
        |  SELECT user_id,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id, ts_ms
        |  FROM sm
        |), si AS (
        |  SELECT user_id, session_id, min(ts_ms) AS lo, max(ts_ms) AS hi
        |  FROM sess GROUP BY 1, 2
        |)
        |SELECT b.burst_id, s.user_id, s.session_id,
        |  least(b.hi, s.hi) - greatest(b.lo, s.lo) AS overlap_ms
        |FROM bi b JOIN si s ON b.lo <= s.hi AND s.lo <= b.hi""".stripMargin,

    // layout must not change content: the same 2-D filter on the
    // ORIGINAL table reproduces the z-ordered read exactly.
    "layout_zorder_scan" ->
      """SELECT event_id, user_id, epoch_us(ts)//3600000000 AS hour,
        |  event_type, value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 7
        |  AND epoch_us(ts)//3600000000 BETWEEN 473500 AND 473560""".stripMargin,

    "events_tumbling" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
        | CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY day, event_type""".stripMargin,

    "events_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sv
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM hourly GROUP BY 1
        |), grid AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM span
        |)
        |SELECT g.event_type, strftime(g.hour, '%Y-%m-%d %H') AS hour,
        |  coalesce(h.n, 0) AS n,
        |  CAST(CAST(last_value(h.sv IGNORE NULLS)
        |    OVER (PARTITION BY g.event_type ORDER BY g.hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS value_locf
        |FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour""".stripMargin,

    "events_funnel" ->
      """SELECT a.user_id FROM
        | (SELECT user_id, min(epoch_us(ts)) AS first_from FROM events
        |   WHERE event_type = 'signup' GROUP BY user_id) a
        | JOIN (SELECT user_id, max(epoch_us(ts)) AS last_to FROM events
        |   WHERE event_type = 'purchase' GROUP BY user_id) b USING (user_id)
        |WHERE b.last_to > a.first_from""".stripMargin,

    "events_json_extract" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "events_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (event_type = 'click') AS click,
        | count(*) FILTER (event_type = 'error') AS error,
        | count(*) FILTER (event_type = 'purchase') AS purchase,
        | count(*) FILTER (event_type = 'signup') AS signup,
        | count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "events_range_join" ->
      """SELECT a.user_id, a.event_id AS anchor_event_id,
        | b.event_id AS other_event_id, b.event_type AS other_type,
        | epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
        |WHERE a.event_type = 'purchase'""".stripMargin,

    "events_lead_lag" ->
      """SELECT user_id, event_id, event_type,
        | lag(event_type, 1) OVER w AS prev_type,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin,

    "events_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events)
        |SELECT cohort_day, day - cohort_day AS d,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY cohort_day, d""".stripMargin,

    "events_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type, bin""".stripMargin,

    "q_median" ->
      """SELECT o_orderstatus,
        | CAST(CAST(CAST(median(o_totalprice) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS median_price,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_set_ops" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000""".stripMargin,

    "q_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        | CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |   ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders""".stripMargin,

    // Exact ×100 fixed-point LONG moment sums, mirroring the Spark
    // formulation (DuckDB sum(BIGINT) is an exact HUGEINT — no hi/lo
    // split needed here; same exact integers → same doubles).
    "q_stats" ->
      """WITH f AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qf,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yf
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(qf) AS sxf, sum(qf * qf) AS sxxf,
        |    sum(yf) AS syf, sum(yf * yf) AS syyf, sum(qf * yf) AS sxyf
        |  FROM f GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(CAST(sxf AS VARCHAR) AS DOUBLE) / 100.0 AS dx,
        |    CAST(CAST(sxxf AS VARCHAR) AS DOUBLE) / 10000.0 AS dxx,
        |    CAST(CAST(syf AS VARCHAR) AS DOUBLE) / 100.0 AS dy,
        |    CAST(CAST(syyf AS VARCHAR) AS DOUBLE) / 10000.0 AS dyy,
        |    CAST(CAST(sxyf AS VARCHAR) AS DOUBLE) / 10000.0 AS dxy
        |  FROM s)
        |SELECT l_returnflag, n,
        | CAST(CAST(CAST(sqrt((dxx - pow(dx, 2) / n) / (n - 1)) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS stddev_qty,
        | CAST(CAST(CAST((dxy - dx * dy / n)
        |   / sqrt((dxx - pow(dx, 2) / n)
        |        * (dyy - pow(dy, 2) / n)) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS corr_qty_price
        |FROM d""".stripMargin,

    "q_strings" ->
      """SELECT p_partkey, upper(p_name) AS upper_name,
        | substring(p_name, 1, 5) AS prefix5,
        | CAST(len(p_name) AS BIGINT) AS name_len,
        | CAST(levenshtein(p_name, 'small widget') AS BIGINT) AS dist_to_small_widget
        |FROM part""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id,
         | len($toksSql) AS n_tokens,
         | CAST(list_sum(list_transform($toksSql, t -> CAST(ceil(len(t)/4.0) AS BIGINT))) AS BIGINT) AS n_subwords
         |FROM documents""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         | len(text) AS n_chars_actual,
         | len(toks) AS n_tokens,
         | CAST(CAST(CAST(CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
         |   / CAST(len(toks) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS stopword_ratio,
         | CAST(CAST(CAST(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS distinct_ratio,
         | CAST(CAST(CAST(CAST(len(replace(text, ' ', '')) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS mean_token_len,
         | CAST(CAST(CAST(CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
         |   / CAST(len(text) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS punct_ratio
         |FROM t""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  ${langScoreSql(Seq("der", "und", "nicht", "das"))} AS s_de,
         |  ${langScoreSql(Seq("the", "and", "not", "this"))} AS s_en,
         |  ${langScoreSql(Seq("el", "los", "que", "este"))} AS s_es,
         |  ${langScoreSql(Seq("le", "les", "que", "ce"))} AS s_fr,
         |  ${langScoreSql(Seq("de", "shi", "bu", "zhe"))} AS s_zh
         | FROM t)
         |SELECT doc_id, CASE
         |  WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |  WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |  WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |  WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |  ELSE 'zh' END AS lang
         |FROM s""".stripMargin,

    // trained langid: the oracle replays the train+predict pipeline —
    // unigram counts on the %5!=0 slice, per-(doc, candidate) sum of
    // ⌊log2⌋ of the fixed-point smoothed probability (len(bin(x))-1,
    // exact in both engines), argmax with lexicographic tie-break. All
    // integer until the argmax, so the hash IS the model: a drift in
    // counts, smoothing, scale, or tie order flips rows.
    "text_langid_trained" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toksSql) AS w FROM documents),
         |train AS (SELECT lang, w FROM tok WHERE doc_id % 5 <> 0),
         |m AS (SELECT lang, w, count(*) AS c FROM train GROUP BY 1, 2),
         |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM m GROUP BY 1),
         |vv AS (SELECT count(DISTINCT w) AS v FROM train),
         |term AS (
         |  SELECT t.doc_id, nl.lang AS cand,
         |    len(bin(((coalesce(m.c, 0) + 1) * 1048576) // (nl.n_l + vv.v))) - 1 AS lg
         |  FROM (SELECT doc_id, w FROM tok) t
         |  CROSS JOIN nl CROSS JOIN vv
         |  LEFT JOIN m ON m.lang = nl.lang AND m.w = t.w),
         |scored AS (SELECT doc_id, cand, CAST(sum(lg) AS BIGINT) AS s_sum
         |  FROM term GROUP BY 1, 2),
         |best AS (SELECT doc_id, cand AS lang_pred FROM scored
         |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s_sum DESC, cand) = 1)
         |SELECT d.doc_id, d.lang, coalesce(b.lang_pred, 'und') AS lang_pred
         |FROM documents d LEFT JOIN best b USING (doc_id)""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,

    // ORC roundtrip: the oracle is the ORIGINAL parquet — the roundtrip
    // must be invisible.
    "source_orc_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM orders""".stripMargin,

    "source_json_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",

    // the DSv2 source's generator, replayed: each field of synthetic row
    // i regenerates from md5("evt-<seed>-<k>-<i>") (SyntheticEvents
    // .fieldValue); the aggregate follows the decimal->double discipline.
    "source_dsv2_scan" ->
      """WITH g AS (
        |  SELECT i,
        |    (['click','view','signup','purchase','error'])[
        |      CAST(CAST(CONCAT('0x', substr(md5('evt-42-2-' || i), 1, 15)) AS BIGINT) % 5 AS INTEGER) + 1] AS event_type,
        |    CAST(CONCAT('0x', substr(md5('evt-42-3-' || i), 1, 15)) AS BIGINT) % 100000 / 100.0 AS value
        |  FROM range(10000) t(i))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM g GROUP BY event_type""".stripMargin,

    // same Rabin-Karp recurrence, seeded by a prepended 0 (DuckDB 1.0's
    // list_reduce has no init argument).
    "text_rollinghash" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform($toksSql,
         |        t -> CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
         |    (acc, x) -> (acc * 31 + x) % 2147483647) AS rh
         |FROM documents""".stripMargin,

    "text_clean_corpus" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE)
         |    / CAST(len(toks) AS DOUBLE) AS DECIMAL(18,6)) AS stopword_ratio,
         |  ${langScoreSql(Seq("der", "und", "nicht", "das"))} AS s_de,
         |  ${langScoreSql(Seq("the", "and", "not", "this"))} AS s_en,
         |  ${langScoreSql(Seq("el", "los", "que", "este"))} AS s_es,
         |  ${langScoreSql(Seq("le", "les", "que", "ce"))} AS s_fr,
         |  ${langScoreSql(Seq("de", "shi", "bu", "zhe"))} AS s_zh
         | FROM t),
         |g AS (SELECT doc_id, text, n_tokens, stopword_ratio, CASE
         |  WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |  WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |  WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |  WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |  ELSE 'zh' END AS lang_pred
         | FROM s
         | WHERE n_tokens >= 10 AND stopword_ratio <= 0.5)
         |SELECT doc_id, lang_pred, n_tokens, CAST(CAST(stopword_ratio AS VARCHAR) AS DOUBLE) AS stopword_ratio FROM g
         |WHERE lang_pred != 'und'
         |QUALIFY row_number() OVER (
         |  PARTITION BY md5(regexp_replace(lower(text), ' +', ' ', 'g'))
         |  ORDER BY doc_id) = 1""".stripMargin,

    // the sketch replays cell by cell: same md5 cell hashes, same
    // cell-wise sums, same min-over-rows estimate. LEFT join + coalesce 0
    // mirrors the Spark side's empty-cell handling.
    "text_countmin" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term),
         |cells AS (
         |  SELECT j,
         |    CAST(CONCAT('0x', substr(md5('cm-' || CAST(j AS VARCHAR) || '-' || term), 1, 15)) AS BIGINT) % 1024 AS cell,
         |    CAST(sum(tf) AS BIGINT) AS cnt
         |  FROM tf CROSS JOIN range(4) r(j) GROUP BY 1, 2),
         |probes AS (SELECT unnest(['the','a','of','and','to','in','is','it','zyzzyva']) AS term),
         |pc AS (
         |  SELECT term, j,
         |    CAST(CONCAT('0x', substr(md5('cm-' || CAST(j AS VARCHAR) || '-' || term), 1, 15)) AS BIGINT) % 1024 AS cell
         |  FROM probes CROSS JOIN range(4) r(j)),
         |est AS (
         |  SELECT term, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cm_est
         |  FROM pc LEFT JOIN cells USING (j, cell) GROUP BY term)
         |SELECT p.term, e.cm_est, CAST(coalesce(tf.tf, 0) AS BIGINT) AS n_exact
         |FROM probes p JOIN est e USING (term) LEFT JOIN tf USING (term)""".stripMargin,

    // chunk i covers [i·150, i·150+200); last-chunk index replays the
    // ceil via double (exact at these magnitudes), empty docs keep one
    // empty chunk.
    "text_chunk" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(greatest(0, ceil((n_chars - 200) / 150.0)) AS BIGINT) + 1)) AS i
        |  FROM documents
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk_text,
        |  CAST(length(substr(text, CAST(i * 150 + 1 AS INT), 200)) AS BIGINT) AS chunk_len
        |FROM c""".stripMargin,

    // same wire synthesis, same normalize→md5→frequency>k→rebuild chain:
    // DuckDB's list_filter/list_contains mirror the Spark higher-order
    // filter, so paragraph order is preserved without positional explode.
    "text_boilerplate" ->
      """WITH wire AS (
        |  SELECT doc_id, concat_ws(chr(10)||chr(10),
        |    CASE WHEN doc_id % 2 = 0 THEN 'NAV Menu  Home About Contact'
        |         ELSE 'nav menu home about contact' END,
        |    substr(text, 1, 80),
        |    CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter today' END,
        |    substr(text, 81, 120),
        |    CASE WHEN doc_id % 7 = 0 THEN 'promo code ' || CAST(doc_id % 5 AS VARCHAR) END,
        |    'copyright 2026 example site all rights reserved') AS text
        |  FROM documents),
        |ph AS (
        |  SELECT md5(lower(regexp_replace(trim(unnest(string_split(text, chr(10)||chr(10)))), '\s+', ' ', 'g'))) AS h
        |  FROM wire),
        |freq AS (SELECT h FROM ph GROUP BY h HAVING count(*) > 20),
        |fs AS (SELECT coalesce(list(h ORDER BY h), []) AS bp FROM freq)
        |SELECT w.doc_id,
        |  array_to_string(list_filter(string_split(w.text, chr(10)||chr(10)),
        |    p -> NOT list_contains(fs.bp, md5(lower(regexp_replace(trim(p), '\s+', ' ', 'g'))))), chr(10)||chr(10)) AS clean_text,
        |  CAST(len(string_split(w.text, chr(10)||chr(10))) AS BIGINT) AS n_paras,
        |  CAST(len(string_split(w.text, chr(10)||chr(10)))
        |    - len(list_filter(string_split(w.text, chr(10)||chr(10)),
        |        p -> NOT list_contains(fs.bp, md5(lower(regexp_replace(trim(p), '\s+', ' ', 'g')))))) AS BIGINT) AS n_dropped
        |FROM wire w CROSS JOIN fs""".stripMargin,

    // same synthesized wire column, same 4 RE2/Java-portable rules: the
    // replace chain and the raw-text counts replay verbatim in DuckDB.
    "text_pii_redact" ->
      """WITH w AS (SELECT doc_id,
        |  substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |  '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ||
        |  CASE WHEN doc_id % 5 <> 0 THEN ' call ' ||
        |    CAST(doc_id % 800 + 200 AS VARCHAR) || '-555-' ||
        |    lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |  CAST((doc_id * 3) % 256 AS VARCHAR) ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' ssn ' ||
        |    lpad(CAST((doc_id * 13) % 1000000000 AS VARCHAR), 9, '0') ELSE '' END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '[0-9]{9,}', '<ID>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(raw, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(raw, '[0-9]{9,}')) AS BIGINT) AS n_ids
        |FROM w""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp,
        | min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY fp""".stripMargin,

    "dedup_exact_survivors" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |QUALIFY row_number() OVER (
        |  PARTITION BY md5(regexp_replace(lower(text), ' +', ' ', 'g'))
        |  ORDER BY doc_id) = 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $bigramShingleCte,
         |$jaccardScoredCtes
         |SELECT doc_id_a, doc_id_b, CAST(CAST(jaccard AS VARCHAR) AS DOUBLE) AS jaccard FROM scored WHERE jaccard >= 0.6""".stripMargin,

    // the exhaustive operator's oracle enumerates ALL pairs — no
    // candidate rule to replay, which is exactly what makes the
    // prefix-filter stage's completeness checkable end to end.
    "dedup_ngram_allpairs" ->
      s"""WITH $bigramShingleCte,
         |scored AS (
         |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |    CAST(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS DECIMAL(18,6)) AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |)
         |SELECT doc_id_a, doc_id_b, CAST(CAST(jaccard AS VARCHAR) AS DOUBLE) AS jaccard
         |FROM scored WHERE jaccard >= 0.6""".stripMargin,

    // passage dedup replayed stage by stage: per-token md5 hashes, the
    // rollingHash recurrence folded over every 8-token window (Rabin-Karp
    // mod 2^31-1), frequent grams (count ≥ 2 corpus-wide), matched
    // positions merged gaps-and-islands into maximal spans.
    "dedup_substring" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_transform($toksSql,
         |    t -> CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) AS th
         |  FROM documents
         |), grams AS (
         |  SELECT doc_id, z['pos'] AS pos, z['gh'] AS gh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(th) - 8 + 2),
         |        i -> {'pos': i - 1,
         |              'gh': list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+7]),
         |                                (acc, x) -> (acc * 31 + x) % 2147483647)})) AS z
         |    FROM t)
         |), freq AS (
         |  SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2
         |), hits AS (
         |  SELECT doc_id, pos FROM grams JOIN freq USING (gh)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM hits
         |)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 7 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM isl GROUP BY doc_id, island""".stripMargin,

    // strip = the spans query applied: rebuild each doc's text from the
    // tokens outside every flagged span (DuckDB's indexed list_filter
    // lambda is 1-based; Spark's is 0-based — hence i-1).
    "dedup_substring_strip" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_transform($toksSql,
         |    t -> CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) AS th
         |  FROM documents
         |), grams AS (
         |  SELECT doc_id, z['pos'] AS pos, z['gh'] AS gh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(th) - 8 + 2),
         |        i -> {'pos': i - 1,
         |              'gh': list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+7]),
         |                                (acc, x) -> (acc * 31 + x) % 2147483647)})) AS z
         |    FROM t)
         |), freq AS (
         |  SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2
         |), hits AS (
         |  SELECT doc_id, pos FROM grams JOIN freq USING (gh)
         |), isl AS (
         |  SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM hits
         |), spans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
         |  FROM isl GROUP BY doc_id, island
         |), sp AS (
         |  SELECT doc_id, list({'s': s, 'e': e}) AS spans FROM spans GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  -- span-free docs keep their ORIGINAL text byte-for-byte;
         |  -- fully-stripped docs: DuckDB's array_to_string([]) is NULL,
         |  -- Spark's array_join([]) is '' — coalesce to the Spark value
         |  CASE WHEN sp.spans IS NULL THEN d.text
         |  ELSE coalesce(array_to_string(
         |    list_filter($toksSql, (x, i) ->
         |      len(list_filter(sp.spans,
         |          s -> i - 1 >= s['s'] AND i - 1 <= s['e'])) = 0),
         |    ' '), '') END AS text
         |FROM documents d LEFT JOIN sp ON d.doc_id = sp.doc_id""".stripMargin,

    // 128-bit SimHash, reproduced bit by bit: each token's hash is the
    // FULL md5 as two unsigned 64-bit words (each assembled from two
    // 8-hex-char halves in HUGEINT); per-bit votes over all 128 bits,
    // sign → two signature words; 4×32-BIT pigeonhole bands for
    // candidates (the scale-hardened bucket width); hamming ≤ 3 verified
    // via bit_count(xor) summed over both words.
    "dedup_simhash" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST(CAST(CONCAT('0x', substr(md5(w), 1, 8)) AS BIGINT) AS HUGEINT) * 4294967296
         |      + CAST(CONCAT('0x', substr(md5(w), 9, 8)) AS BIGINT) AS u0,
         |    CAST(CAST(CONCAT('0x', substr(md5(w), 17, 8)) AS BIGINT) AS HUGEINT) * 4294967296
         |      + CAST(CONCAT('0x', substr(md5(w), 25, 8)) AS BIGINT) AS u1
         |  FROM (SELECT doc_id, unnest($toksSql) AS w FROM documents)
         |), v AS (
         |  SELECT doc_id, k, b,
         |    sum(CASE WHEN ((CASE WHEN k = 0 THEN u0 ELSE u1 END) >> b) % 2 = 1
         |        THEN 1 ELSE -1 END) AS vote
         |  FROM h CROSS JOIN range(2) tk(k) CROSS JOIN range(64) tb(b)
         |  GROUP BY doc_id, k, b
         |), su AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN k = 0 AND vote > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS us0,
         |    sum(CASE WHEN k = 1 AND vote > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END) AS us1
         |  FROM v GROUP BY doc_id
         |), bands AS (
         |  SELECT doc_id, us0, us1, band,
         |    CAST(CASE band
         |      WHEN 0 THEN us0 % 4294967296
         |      WHEN 1 THEN us0 >> 32
         |      WHEN 2 THEN us1 % 4294967296
         |      ELSE us1 >> 32 END AS BIGINT) AS bucket
         |  FROM su CROSS JOIN range(4) t(band)
         |)
         |SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  CAST(bit_count(xor(a.us0, b.us0)) + bit_count(xor(a.us1, b.us1)) AS BIGINT) AS hamming
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.us0, b.us0)) + bit_count(xor(a.us1, b.us1)) <= 3""".stripMargin,

    // MinHash-LSH, reproduced stage by stage: the base hash is the first
    // 15 hex chars of md5 (= VecTextKernels.md5Mod60), the 64 permutation
    // coefficients regenerate from the same md5 recipe, the universal
    // hash runs in HUGEINT mod 2^61-1 (= mulAddMod61), band buckets are
    // the 4-value signature slices, and candidates are exact-Jaccard
    // verified like the ngram oracle.
    "dedup_minhash" ->
      s"""WITH $bigramShingleCte,
         |$minhashCandSql, mscored AS (
         |  SELECT c.doc_id_a, c.doc_id_b,
         |    CAST(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) AS DECIMAL(18,6)) AS jaccard
         |  FROM mcand c JOIN sh x ON c.doc_id_a = x.doc_id JOIN sh y ON c.doc_id_b = y.doc_id
         |)
         |SELECT doc_id_a, doc_id_b, CAST(CAST(jaccard AS VARCHAR) AS DOUBLE) AS jaccard
         |FROM mscored WHERE jaccard >= 0.7""".stripMargin,

    // same candidate CTEs, Levenshtein verify (exact integer DP in both
    // engines; threshold 5 mirrors Dedup.editDistanceNearDups' default).
    "dedup_editdist" ->
      s"""WITH $bigramShingleCte,
         |$minhashCandSql, ed AS (
         |  SELECT c.doc_id_a, c.doc_id_b,
         |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
         |  FROM mcand c
         |  JOIN documents a ON c.doc_id_a = a.doc_id
         |  JOIN documents b ON c.doc_id_b = b.doc_id)
         |SELECT doc_id_a, doc_id_b, dist FROM ed WHERE dist <= 5""".stripMargin,

    // same pairwise stage as dedup_ngram_jaccard, then connected
    // components via a recursive CTE: reach = transitive closure of the
    // (undirected) pair edges; cluster id = min doc_id reachable.
    "dedup_cluster" ->
      s"""WITH RECURSIVE $bigramShingleCte,
         |$jaccardScoredCtes,
         |pairs AS (SELECT doc_id_a, doc_id_b FROM scored WHERE jaccard >= 0.6),
         |edges AS (
         |  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
         |  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs
         |), walk(node, reach) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
         |), comp AS (
         |  SELECT node AS doc_id, min(reach) AS min_reach FROM walk GROUP BY node
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(least(c.min_reach, d.doc_id), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,

    "text_decontaminate" ->
      s"""WITH $bigramShingleCte,
         |x AS (SELECT doc_id, doc_id % 37 = 0 AS is_bench, unnest(sh) AS ng FROM sh),
         |bench AS (SELECT DISTINCT ng, doc_id AS bench_doc_id FROM x WHERE is_bench),
         |corpus AS (SELECT doc_id, ng FROM x WHERE NOT is_bench)
         |SELECT doc_id, CAST(count(DISTINCT ng) AS BIGINT) AS n_shared_ngrams,
         | CAST(count(DISTINCT bench_doc_id) AS BIGINT) AS n_benchmark_docs
         |FROM corpus JOIN bench USING (ng)
         |GROUP BY doc_id HAVING count(DISTINCT ng) >= 3""".stripMargin,

    // identical result to text_decontaminate by construction (the Bloom
    // stage only prunes; the verify join restores exactness), so the
    // oracle replays the same exact SQL.
    "text_decontaminate_bloom" ->
      s"""WITH $bigramShingleCte,
         |x AS (SELECT doc_id, doc_id % 37 = 0 AS is_bench, unnest(sh) AS ng FROM sh),
         |bench AS (SELECT DISTINCT ng, doc_id AS bench_doc_id FROM x WHERE is_bench),
         |corpus AS (SELECT doc_id, ng FROM x WHERE NOT is_bench)
         |SELECT doc_id, CAST(count(DISTINCT ng) AS BIGINT) AS n_shared_ngrams,
         | CAST(count(DISTINCT bench_doc_id) AS BIGINT) AS n_benchmark_docs
         |FROM corpus JOIN bench USING (ng)
         |GROUP BY doc_id HAVING count(DISTINCT ng) >= 3""".stripMargin,

    // BM25 with rational idf, every fractional literal forced ::DOUBLE
    // (DuckDB parses bare 0.5 as DECIMAL, which would change the IEEE
    // op sequence vs Spark's double arithmetic); term contributions sum
    // left-to-right in query-term order, exactly as the Spark reduce.
    "text_retrieval_bm25" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl,
         |    CAST(len(list_filter($toksSql, x -> x = 'join')) AS BIGINT) AS tf0,
         |    CAST(len(list_filter($toksSql, x -> x = 'scan')) AS BIGINT) AS tf1,
         |    CAST(len(list_filter($toksSql, x -> x = 'slow')) AS BIGINT) AS tf2
         |  FROM documents),
         |g AS (
         |  SELECT count(*) AS n, sum(dl) AS sdl,
         |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
         |  FROM d)
         |SELECT doc_id,
         |  CAST(CAST(CAST(
         |    ((n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE)) * (tf0 * 2.2::DOUBLE)
         |      / (tf0 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (dl / (CAST(sdl AS DOUBLE) / n))))
         |  + ((n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE)) * (tf1 * 2.2::DOUBLE)
         |      / (tf1 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (dl / (CAST(sdl AS DOUBLE) / n))))
         |  + ((n - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE)) * (tf2 * 2.2::DOUBLE)
         |      / (tf2 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (dl / (CAST(sdl AS DOUBLE) / n))))
         |  AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS score
         |FROM d CROSS JOIN g
         |WHERE tf0 + tf1 + tf2 > 0""".stripMargin,

    // bigram-LM surprisal: all-integer fixed point (x10000 floor-div)
    // until ONE final double division, so no ln/exp enters the hash.
    // DuckDB `//` floors like Spark's `div` on the positive operands here;
    // the HUGEINT sum casts through BIGINT (exact: sums < 2^53).
    "text_ppl" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |bgall AS (
         |  SELECT doc_id, lang, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT)+1] AS w2
         |  FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
         |        FROM t WHERE len(toks) >= 2)),
         |bm AS (SELECT w1, w2, count(*) AS cb FROM bgall WHERE lang = 'en' GROUP BY 1, 2),
         |um AS (SELECT w1, count(*) AS cu
         |       FROM (SELECT unnest(toks) AS w1 FROM t WHERE lang = 'en') GROUP BY 1),
         |vv AS (SELECT count(*) AS v FROM um),
         |term AS (
         |  SELECT b.doc_id,
         |    ((coalesce(um.cu, 0) + vv.v) * 10000) // (coalesce(bm.cb, 0) + 1) AS s_fp
         |  FROM bgall b
         |  LEFT JOIN bm ON b.w1 = bm.w1 AND b.w2 = bm.w2
         |  LEFT JOIN um ON b.w1 = um.w1
         |  CROSS JOIN vv)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(CAST(sum(s_fp) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) * 10000 AS DOUBLE) AS surprisal
         |FROM term GROUP BY doc_id""".stripMargin,

    // DSIR mean likelihood ratio, same fixed-point discipline.
    "text_dsir" ->
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS is_t, unnest($toksSql) AS w FROM documents),
         |m AS (SELECT w, count(*) AS cb,
         |        CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |      FROM t GROUP BY 1),
         |s AS (SELECT CAST(sum(cb) AS BIGINT) AS nb, CAST(sum(ct) AS BIGINT) AS nt,
         |        count(*) AS v FROM m),
         |term AS (
         |  SELECT t.doc_id,
         |    ((m.ct + 1) * (s.nb + s.v) * 10000) // ((m.cb + 1) * (s.nt + s.v)) AS r_fp
         |  FROM t JOIN m USING (w) CROSS JOIN s)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(CAST(sum(r_fp) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) * 10000 AS DOUBLE) AS dsir_w
         |FROM term GROUP BY doc_id""".stripMargin,

    "text_top_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf * (n_docs + 1) AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id,
         | CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk,
         | term, tf, df, score
         |FROM scored QUALIFY rnk <= 3""".stripMargin,

    // md5-fraction split; 4294967296.0 and the fractions forced ::DOUBLE
    // (DuckDB parses bare decimals as DECIMAL); the val bound is written
    // as the same two-term double sum Scala computes.
    "sample_split" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CAST(CONCAT('0x', substr(md5('split1-' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0::DOUBLE AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u < 0.05::DOUBLE THEN 'test'
        |       WHEN u < 0.05::DOUBLE + 0.05::DOUBLE THEN 'val'
        |       ELSE 'train' END AS split
        |FROM u""".stripMargin,

    "sample_hash" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'""".stripMargin,

    // epoch-salted md5 permutation: shard = first 32 hash bits mod 8,
    // pos = dense rank of the full hash within the shard.
    "sample_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':1') AS hh
        |           FROM documents),
        |s AS (SELECT doc_id, hh,
        |        CAST(CONCAT('0x', substr(hh, 1, 8)) AS BIGINT) % 8 AS shard FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT) - 1 AS pos
        |FROM s""".stripMargin,

    // hashed-linear classifier: per-token integer weights (md5-derived,
    // ×1000) sum exactly; score rounds through DECIMAL(18,6) and the
    // keep decision applies to the ROUNDED score on both engines.
    "text_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(COALESCE(list_sum(list_transform(toks,
         |    x -> CAST(CONCAT('0x', substr(md5(x), 1, 8)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT) AS w_sum,
         |  CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
         |r AS (SELECT doc_id, w_sum, n_tokens,
         |  CAST(CAST(CAST(CASE WHEN n_tokens > 0
         |    THEN w_sum / (n_tokens * 1000.0) END AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS score
         |  FROM s)
         |SELECT doc_id, w_sum, n_tokens, score,
         |  COALESCE(score > 0.05, FALSE) AS keep
         |FROM r""".stripMargin,

    // BPE: every merge round replayed from scratch — same pair counts,
    // same (count, lhs, rhs) argmax, same greedy wire-form replace
    "text_bpe_vocab" -> bpeVocabOracle(merges = 8),
    "text_bpe_encode" -> bpeEncodeOracle(merges = 8),

    // packing under the replayed BPE budgets: the encode oracle's CTEs
    // feed the same cumulative-sum window as pack_sequences
    "pack_sequences_bpe" ->
      s"""WITH ${bpeRoundsCte(8)},
        |enc AS (
        |  SELECT word,
        |    CAST(len(string_split(substr(s, 2, length(s) - 2), '||')) AS BIGINT) AS n_p
        |  FROM s8),
        |t AS (
        |  SELECT d.doc_id, d.source, COALESCE(x.n_p, 0) AS n_tokens
        |  FROM documents d LEFT JOIN (
        |    SELECT tok.doc_id, CAST(sum(enc.n_p) AS BIGINT) AS n_p
        |    FROM tok JOIN enc ON tok.t = enc.word GROUP BY tok.doc_id) x
        |  USING (doc_id)),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_before,
        |  cum_before // 2048 AS seq_idx, cum_before % 2048 AS seq_offset
        |FROM c""".stripMargin,

    // the TRAINED classifier: all GD rounds unrolled as CTE stages —
    // exact sums (HUGEINT = the Spark side's decimal(38,0)),
    // truncating // (= Spark div, toward zero incl. negatives), so
    // weights, scores and keep decisions replay bit-identically
    "text_quality_classifier_trained" -> trainedClassifierOracle(rounds = 3),

    // the whole curation pipeline, stage by stage: quality/lang gates
    // (clean_corpus recipe) + repetition gate + fingerprint dedup +
    // decontamination anti-join + sqrt-mixture + per-source packing.
    "text_curation_pipeline" -> curationOracle(extraGateSql = ""),

    // the same pipeline with the TRAINED gate: the classifier's full
    // 3-round training replay nests as a derived-table subquery inside
    // the gated CTE — one oracle hash covers train + gate + curate
    "text_curation_trained" -> curationOracle(extraGateSql =
      s"""\n         |    AND doc_id IN (SELECT doc_id FROM (\n         |${trainedClassifierOracle(rounds = 3)}\n         |    ) WHERE keep)""".stripMargin),

    // exact per-group percentiles (quantile_cont = Spark `percentile`,
    // linear interpolation); bounds rounded to decimal(18,6) both sides.
    "text_length_filter" ->
      """WITH b AS (
        |  SELECT lang AS len_g,
        |    CAST(CAST(CAST(quantile_cont(n_chars, 0.02) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS len_lo,
        |    CAST(CAST(CAST(quantile_cont(n_chars, 0.98) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS len_hi
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, lang, source, n_chars, len_lo, len_hi
        |FROM documents d JOIN b ON d.lang = b.len_g
        |WHERE n_chars >= len_lo AND n_chars <= len_hi""".stripMargin,

    // rate = sqrt(n_min/n_g): sqrt and the long/2^32 hash fraction are
    // both correctly-rounded IEEE ops, so the selected subset is
    // bit-identical across engines.
    "sample_mixture" ->
      """WITH c AS (SELECT lang AS mix_g, count(*) AS n_g FROM documents GROUP BY lang),
        |m AS (SELECT min(n_g) AS n_min FROM c),
        |r AS (SELECT mix_g, sqrt(CAST(n_min AS DOUBLE) / CAST(n_g AS DOUBLE)) AS rate
        |      FROM c CROSS JOIN m)
        |SELECT doc_id, lang, source, n_chars,
        |  CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS sample_rate
        |FROM documents d JOIN r ON d.lang = r.mix_g
        |WHERE CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  / 4294967296.0 < rate""".stripMargin,

    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, source, n_tokens, cum_before,
         |  cum_before // 2048 AS seq_idx, cum_before % 2048 AS seq_offset
         |FROM c""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source, n_chars,
        | CAST(row_number() OVER (
        |   PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |FROM documents QUALIFY rn <= 50""".stripMargin,

    // same URL synthesis, same anchored canonicalization regexes (all
    // RE2/Java portable), same md5-rank per-domain quota.
    "sample_domain_cap" ->
      """WITH wire AS (
        |  SELECT doc_id,
        |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS://' WHEN 1 THEN 'http://' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
        |    'Site' || CAST(doc_id % 37 AS VARCHAR) || '.Example.COM' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
        |    '/page/' || CAST(doc_id AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=x' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_extract(
        |      regexp_replace(lower(trim(url)), '^[a-z][a-z0-9+.-]*://', ''),
        |      '^([^/?#]*)', 1), ':[0-9]+$', ''), '^www\.', '') AS domain
        |  FROM wire)
        |SELECT doc_id, domain,
        |  CAST(row_number() OVER (
        |    PARTITION BY domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
        |FROM canon QUALIFY rn <= 8""".stripMargin,

    // repetition signals: bigrams counted WITH multiplicity (range over
    // positions), unlike the distinct-shingle CTE.
    "text_repetition" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |u AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_unigram_n
         |  FROM (SELECT doc_id, w, count(*) AS c
         |        FROM (SELECT doc_id, unnest(toks) AS w FROM tok) GROUP BY doc_id, w)
         |  GROUP BY doc_id
         |), b AS (
         |  SELECT doc_id, max(c) AS top_bigram_n
         |  FROM (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id,
         |                unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
         |              FROM tok WHERE len(toks) >= 2)
         |        GROUP BY doc_id, g)
         |  GROUP BY doc_id
         |)
         |SELECT t.doc_id,
         |  CAST(coalesce(u.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(u.top_unigram_n, 0) AS BIGINT) AS top_unigram_n,
         |  CAST(coalesce(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
         |  CASE WHEN coalesce(u.n_tokens, 0) > 0 THEN
         |    CAST(CAST(CAST(CAST(u.top_unigram_n AS DOUBLE) / CAST(u.n_tokens AS DOUBLE)
         |      AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) END AS top_unigram_frac,
         |  CASE WHEN coalesce(u.n_tokens, 0) > 1 THEN
         |    CAST(CAST(CAST(CAST(coalesce(b.top_bigram_n, 0) AS DOUBLE) / CAST(u.n_tokens - 1 AS DOUBLE)
         |      AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) END AS top_bigram_frac
         |FROM tok t LEFT JOIN u ON t.doc_id = u.doc_id LEFT JOIN b ON t.doc_id = b.doc_id""".stripMargin,

    "sim_topk_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(list_zip(q_emb, c_emb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(c_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        |  FROM c CROSS JOIN q WHERE query_id != neighbor_id)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
        |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // random-hyperplane LSH, reproduced stage by stage: hyperplane
    // component (p,i) regenerates from md5("rhp-p-i") like the Spark
    // kernel; dot products accumulate sequentially (list_sum), so the
    // sign bits — and therefore buckets, candidates and the re-rank —
    // are bit-identical.
    "sim_lsh_ann" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |), sigb AS (
        |  SELECT vec_id, p,
        |    list_sum(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) *
        |        (CAST(CAST(CONCAT('0x', substr(md5('rhp-' || p || '-' || (i - 1)), 1, 15)) AS BIGINT)
        |          % 1000000 AS DOUBLE) / 1000000.0 - 0.5))) AS dotp
        |  FROM embeddings CROSS JOIN range(16) tp(p)
        |), sig AS (
        |  SELECT vec_id, sum(CASE WHEN dotp > 0 THEN 1 << p ELSE 0 END) AS usig
        |  FROM sigb GROUP BY vec_id
        |), bands AS (
        |  SELECT vec_id, band, CAST((usig >> (4 * band)) % 16 AS BIGINT) AS bucket
        |  FROM sig CROSS JOIN range(4) tb(band)
        |), cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM bands q JOIN bands c ON q.band = c.band AND q.bucket = c.bucket
        |  WHERE q.vec_id < 8 AND q.vec_id != c.vec_id
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (qe.nrm * ce.nrm) AS cos
        |  FROM cand JOIN e qe ON cand.query_id = qe.vec_id JOIN e ce ON cand.neighbor_id = ce.vec_id
        |)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
        |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // IVF with TRAINED quantizer, stage by stage: decimal-sum init
    // centroids (per label), two unrolled Lloyd rounds (assign → exact
    // decimal-sum recompute — every round engine-identical), final
    // assignment = inverted lists, nprobe=2 probing, exact re-rank.
    "sim_ivf_ann" ->
      s"""WITH cent0 AS (
         |  ${ivfCentroidSql("(SELECT label AS centroid_id, embedding FROM embeddings)")}
         |), asn1 AS (
         |  ${ivfAssignSql("cent0")}
         |), cent1 AS (
         |  ${ivfCentroidSql("asn1")}
         |), asn2 AS (
         |  ${ivfAssignSql("cent1")}
         |), cent2 AS (
         |  ${ivfCentroidSql("asn2")}
         |), lists AS (
         |  SELECT centroid_id, vec_id AS neighbor_id, embedding AS c_emb
         |  FROM (${ivfAssignSql("cent2")})
         |), probes AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, centroid_id
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id,
         |      ${ivfCosSql("e.embedding", "c.centroid")} AS d
         |    FROM embeddings e CROSS JOIN cent2 c WHERE e.vec_id < 8)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, centroid_id) <= 2
         |), scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${ivfCosSql("q_emb", "c_emb")} AS cos
         |  FROM lists JOIN probes USING (centroid_id) WHERE query_id != neighbor_id
         |)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
         |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
         |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // label-free IVF twin: identical unrolled Lloyd rounds, but cent0
    // comes from the 8 corpus vectors ranked first by md5('ivfseed-' ||
    // vec_id) — lexicographic hex order is engine-identical, so the seed
    // set (and therefore the whole training replay) matches Spark's
    // TakeOrderedAndProject selection exactly. No label column anywhere.
    "sim_ivf_ann_unlabeled" ->
      s"""WITH seeds AS (
         |  SELECT vec_id AS centroid_id, embedding FROM embeddings
         |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
         |), cent0 AS (
         |  ${ivfCentroidSql("seeds")}
         |), asn1 AS (
         |  ${ivfAssignSql("cent0")}
         |), cent1 AS (
         |  ${ivfCentroidSql("asn1")}
         |), asn2 AS (
         |  ${ivfAssignSql("cent1")}
         |), cent2 AS (
         |  ${ivfCentroidSql("asn2")}
         |), lists AS (
         |  SELECT centroid_id, vec_id AS neighbor_id, embedding AS c_emb
         |  FROM (${ivfAssignSql("cent2")})
         |), probes AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb, centroid_id
         |  FROM (
         |    SELECT e.vec_id, e.embedding, c.centroid_id,
         |      ${ivfCosSql("e.embedding", "c.centroid")} AS d
         |    FROM embeddings e CROSS JOIN cent2 c WHERE e.vec_id < 8)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, centroid_id) <= 2
         |), scored AS (
         |  SELECT query_id, neighbor_id,
         |    ${ivfCosSql("q_emb", "c_emb")} AS cos
         |  FROM lists JOIN probes USING (centroid_id) WHERE query_id != neighbor_id
         |)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
         |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
         |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // SemDeDup, stage by stage: the identical label-free trained
    // quantizer replay as sim_ivf_ann_unlabeled (md5 seeds → 2 unrolled
    // Lloyd rounds), then within-cluster domination — a vector is pruned
    // when an earlier cluster-mate's exact cosine reaches the threshold.
    "sim_semdedup" ->
      s"""WITH seeds AS (
         |  SELECT vec_id AS centroid_id, embedding FROM embeddings
         |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
         |), cent0 AS (
         |  ${ivfCentroidSql("seeds")}
         |), asn1 AS (
         |  ${ivfAssignSql("cent0")}
         |), cent1 AS (
         |  ${ivfCentroidSql("asn1")}
         |), asn2 AS (
         |  ${ivfAssignSql("cent1")}
         |), cent2 AS (
         |  ${ivfCentroidSql("asn2")}
         |), asn AS (
         |  ${ivfAssignSql("cent2")}
         |), dominated AS (
         |  SELECT DISTINCT b.vec_id AS vec_id
         |  FROM asn a JOIN asn b
         |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
         |  WHERE ${ivfCosSql("a.embedding", "b.embedding")} >= 0.3
         |)
         |SELECT vec_id, centroid_id AS cluster_id FROM asn
         |WHERE vec_id NOT IN (SELECT vec_id FROM dominated)""".stripMargin,

    // int8 scalar quantization, stage by stage: per-dim (min, scale)
    // grid over the corpus, u8 codes via half-away-from-zero round
    // (engine-identical), ADC cosine over the DEQUANTIZED arrays in
    // sequential double order, window top-k.
    "sim_sq8_ann" ->
      """WITH st AS (
        |  SELECT z[2] AS pos, min(CAST(z[1] AS DOUBLE)) AS mn, max(CAST(z[1] AS DOUBLE)) AS mx
        |  FROM (SELECT unnest(list_zip(embedding, range(1, len(embedding) + 1))) AS z
        |        FROM embeddings)
        |  GROUP BY pos
        |), qp AS (
        |  SELECT list(mn ORDER BY pos) AS mns,
        |    list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 0.0 END ORDER BY pos) AS scs
        |  FROM st
        |), deq AS (
        |  SELECT vec_id,
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> mns[i] + (CASE WHEN scs[i] > 0
        |        THEN least(255.0, greatest(0.0,
        |          round((CAST(embedding[i] AS DOUBLE) - mns[i]) / scs[i])))
        |        ELSE 0.0 END) * scs[i]) AS d
        |  FROM embeddings CROSS JOIN qp
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.d, c.d), p -> p[1] * p[2]))
        |    / (sqrt(list_sum(list_transform(q.d, v -> v * v)))
        |       * sqrt(list_sum(list_transform(c.d, v -> v * v)))) AS cos
        |  FROM deq c CROSS JOIN deq q WHERE q.vec_id < 8 AND q.vec_id != c.vec_id
        |)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  neighbor_id, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
        |FROM scored QUALIFY rnk <= 5""".stripMargin,

    // cluster-balanced sample: identical trained-quantizer replay, then
    // a per-cluster md5-rank quota.
    "sample_cluster_balanced" ->
      s"""WITH seeds AS (
         |  SELECT vec_id AS centroid_id, embedding FROM embeddings
         |  ORDER BY md5('ivfseed-' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
         |), cent0 AS (
         |  ${ivfCentroidSql("seeds")}
         |), asn1 AS (
         |  ${ivfAssignSql("cent0")}
         |), cent1 AS (
         |  ${ivfCentroidSql("asn1")}
         |), asn2 AS (
         |  ${ivfAssignSql("cent1")}
         |), cent2 AS (
         |  ${ivfCentroidSql("asn2")}
         |), asn AS (
         |  ${ivfAssignSql("cent2")}
         |)
         |SELECT vec_id, centroid_id AS cluster_id FROM asn
         |QUALIFY row_number() OVER (PARTITION BY centroid_id
         |  ORDER BY md5('cbs-' || CAST(vec_id AS VARCHAR)), vec_id) <= 32""".stripMargin,

    // PQ: per-subspace Lloyd codebooks + ADC — see pqOracleSql.
    "sim_pq_ann" -> pqOracleSql(),

    "sim_pq_refine_ann" -> pqRefineOracleSql(rerank = 40),
    // IVF-PQ: coarse-list pruning + ADC — see ivfPqOracleSql.
    "sim_ivfpq_ann" -> ivfPqOracleSql(),
    // IVF-PQ + exact refine — same oracle with the re-rank tail.
    "sim_ivfpq_refine_ann" -> ivfPqOracleSql(rerank = 40),

    "sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS query_label, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label, embedding AS c_emb
        |      FROM embeddings),
        |scored AS (
        |  SELECT query_id, query_label, neighbor_id, neighbor_label,
        |    list_sum(list_transform(list_zip(q_emb, c_emb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(c_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        |  FROM c CROSS JOIN q WHERE query_label != neighbor_label)
        |SELECT query_id, query_label,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  neighbor_id, neighbor_label,
        |  CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
        |FROM scored QUALIFY rnk <= 5""".stripMargin,

    "sim_embed_neardup" ->
      """WITH s AS (
        |  SELECT a.label, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, vec_id_a, vec_id_b, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
        |FROM s WHERE cos >= 0.3""".stripMargin,

    // label-free LSH near-dup, replayed stage by stage: the 64 hyperplanes
    // regenerate from md5("rhp-p-i") (shared with sim_lsh_ann's recipe,
    // precomputed once as per-plane component lists), signatures from
    // sequential-order dot products, candidates from 8 bands of 8 bits,
    // then the exact-cosine verify of sim_embed_neardup. DISTINCT here =
    // the Spark side's smallest-shared-band single emission.
    "sim_embed_neardup_lsh" ->
      s"""WITH $rhpNearDupCtes
         |SELECT vec_id_a, vec_id_b, CAST(CAST(CAST(cos AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS cosine
         |FROM scored WHERE cos >= 0.3""".stripMargin,

    // embedding decontamination: cross-table RHP collisions (corpus side
    // vec_id % 37 != 0 vs bench side = 0), exact-cosine verify, per-corpus
    // vector hit tally. DISTINCT = Spark's min-shared-band single emission.
    "sim_embed_decontaminate" ->
      s"""WITH $rhpSigCtes, cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS bench_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
         |  WHERE a.vec_id % 37 != 0 AND b.vec_id % 37 = 0
         |), dscored AS (
         |  SELECT cand.vec_id AS vec_id, cand.bench_id AS bench_id,
         |    list_sum(list_transform(list_zip(x.embedding, y.embedding),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) / (x.nrm * y.nrm) AS cos
         |  FROM cand JOIN e x ON cand.vec_id = x.vec_id JOIN e y ON cand.bench_id = y.vec_id
         |)
         |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_benchmark_hits,
         |  CAST(CAST(max(CAST(cos AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS max_cosine
         |FROM dscored WHERE cos >= 0.3 GROUP BY vec_id""".stripMargin,

    // near-dup clusters over the label-free LSH pairs: the dedup_cluster
    // recursive-CTE walk applied to the embedding pair stage above.
    "sim_embed_clusters" ->
      s"""WITH RECURSIVE $rhpNearDupCtes,
         |pairs AS (SELECT vec_id_a, vec_id_b FROM scored WHERE cos >= 0.3),
         |edges AS (
         |  SELECT vec_id_a AS src, vec_id_b AS dst FROM pairs
         |  UNION ALL SELECT vec_id_b, vec_id_a FROM pairs
         |), walk(node, reach) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT w.node, e2.dst FROM walk w JOIN edges e2 ON w.reach = e2.src
         |), comp AS (
         |  SELECT node AS vec_id, min(reach) AS min_reach FROM walk GROUP BY node
         |)
         |SELECT v.vec_id,
         |  CAST(coalesce(least(c.min_reach, v.vec_id), v.vec_id) AS BIGINT) AS cluster_id
         |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.vec_id""".stripMargin,

    // one survivor per near-dup cluster (the cluster's min vec_id) — the
    // embedding-level "deduplicated corpus" selection.
    "sim_embed_dedup_survivors" ->
      s"""WITH RECURSIVE $rhpNearDupCtes,
         |pairs AS (SELECT vec_id_a, vec_id_b FROM scored WHERE cos >= 0.3),
         |edges AS (
         |  SELECT vec_id_a AS src, vec_id_b AS dst FROM pairs
         |  UNION ALL SELECT vec_id_b, vec_id_a FROM pairs
         |), walk(node, reach) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT w.node, e2.dst FROM walk w JOIN edges e2 ON w.reach = e2.src
         |), comp AS (
         |  SELECT node AS vec_id, min(reach) AS min_reach FROM walk GROUP BY node
         |)
         |SELECT v.vec_id, v.label
         |FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.vec_id
         |WHERE coalesce(least(c.min_reach, v.vec_id), v.vec_id) = v.vec_id""".stripMargin,

    "mm_decode" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT asset_id, media_type, n_bytes,
        |  n_bytes % 640 + 16 AS width,
        |  (n_bytes * 7) % 480 + 16 AS height,
        |  CASE WHEN media_type = 'video' THEN n_bytes % 120 + 1 ELSE 1 END AS n_frames
        |FROM a""".stripMargin,

    "mm_resize" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |d AS (
        |  SELECT asset_id, n_bytes % 640 + 16 AS width, (n_bytes * 7) % 480 + 16 AS height FROM a)
        |SELECT asset_id, width, height,
        |  least(224 * height, 224 * width) // height AS out_w,
        |  least(224 * height, 224 * width) // width AS out_h
        |FROM d""".stripMargin,

    // frame sampling over frame counts the decoder RECOVERED from GIF
    // bytes — the oracle states the planted counts in closed form
    "mm_frames" ->
      """WITH d AS (
        |  SELECT doc_id AS asset_id, CAST(4 + doc_id % 28 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT asset_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx FROM d""".stripMargin,

    "mm_features" ->
      """WITH d AS (
        |  SELECT doc_id AS asset_id, CAST(4 + doc_id % 28 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT asset_id, unnest(range(0, n_frames, 4)) AS frame_idx FROM d)
        |SELECT asset_id, frame_idx,
        |  CAST(CONCAT('0x', substr(md5(asset_id || '-' || frame_idx), 1, 15)) AS BIGINT) AS feature_seed
        |FROM f""".stripMargin,

    // the REAL-codec decode: ground truth in closed form over doc_id —
    // the Spark side must recover every value from actual PNG/WAV/GIF
    // bytes. Video means are floor(Σ frame-color / n_frames) (uniform
    // frame dims make the decoder's total-pixel mean reduce to that).
    // the lossy contract's exact half: dims are lossless in JPEG and
    // the verdict must be uniformly true — a decoder drifting past the
    // pinned tolerance flips rows to false and fails this hash
    "mm_decode_jpeg" ->
      """SELECT doc_id AS asset_id, 16 + doc_id % 48 AS width,
        | 16 + (doc_id * 7) % 32 AS height, true AS within_tol
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,

    "mm_decode_real" ->
      """WITH ia AS (
        |  SELECT doc_id AS asset_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |    CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 48 ELSE 0 END AS width,
        |    CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 32 ELSE 0 END AS height,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 256 + doc_id % 512 END AS n_frames,
        |    CASE WHEN doc_id % 3 = 0 THEN (doc_id * 37) % 256 ELSE 0 END AS mean_r,
        |    CASE WHEN doc_id % 3 = 0 THEN (doc_id * 59) % 256 ELSE 0 END AS mean_g,
        |    CASE WHEN doc_id % 3 = 0 THEN (doc_id * 83) % 256 ELSE 0 END AS mean_b,
        |    CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 8000 END AS sample_rate,
        |    CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 500 + doc_id % 1000 END AS rms
        |  FROM documents WHERE doc_id % 3 < 2),
        |v AS (
        |  SELECT doc_id AS asset_id, 16 + doc_id % 32 AS width,
        |    16 + (doc_id * 5) % 24 AS height,
        |    CAST(4 + doc_id % 28 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |vf AS (
        |  SELECT asset_id, n_frames, unnest(range(0, n_frames)) AS f FROM v),
        |vm AS (
        |  -- sum() is HUGEINT in DuckDB; cast back so the unioned column
        |  -- stays BIGINT like the Spark side
        |  SELECT asset_id,
        |    CAST(sum((asset_id * 37 + f * 11) % 256) // max(n_frames) AS BIGINT) AS mean_r,
        |    CAST(sum((asset_id * 59 + f * 23) % 256) // max(n_frames) AS BIGINT) AS mean_g,
        |    CAST(sum((asset_id * 83 + f * 31) % 256) // max(n_frames) AS BIGINT) AS mean_b
        |  FROM vf GROUP BY asset_id)
        |SELECT * FROM ia
        |UNION ALL
        |SELECT v.asset_id, 'video' AS media_type, v.width, v.height,
        |  v.n_frames, vm.mean_r, vm.mean_g, vm.mean_b,
        |  0 AS sample_rate, 0 AS rms
        |FROM v JOIN vm USING (asset_id)""".stripMargin,

    // per-frame video recovery: every frame's planted dims and colors
    "mm_video_real" ->
      """WITH v AS (
        |  SELECT doc_id AS asset_id, 16 + doc_id % 32 AS width,
        |    16 + (doc_id * 5) % 24 AS height,
        |    CAST(4 + doc_id % 28 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2),
        |vf AS (
        |  SELECT asset_id, width, height, unnest(range(0, n_frames)) AS frame_idx FROM v)
        |SELECT asset_id, frame_idx, width, height,
        |  (asset_id * 37 + frame_idx * 11) % 256 AS mean_r,
        |  (asset_id * 59 + frame_idx * 23) % 256 AS mean_g,
        |  (asset_id * 83 + frame_idx * 31) % 256 AS mean_b
        |FROM vf""".stripMargin,

    // the real resize: fit-into-224 integer arithmetic on the closed-form
    // source dims; constant-color means survive the rescale exactly
    "mm_resize_real" ->
      """WITH d AS (
        |  SELECT doc_id AS asset_id,
        |    16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 32 AS h
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT asset_id,
        |  least(224 * h, 224 * w) // h AS out_w,
        |  least(224 * h, 224 * w) // w AS out_h,
        |  (asset_id * 37) % 256 AS mean_r,
        |  (asset_id * 59) % 256 AS mean_g,
        |  (asset_id * 83) % 256 AS mean_b
        |FROM d""".stripMargin,

    // Block-hash signature replayed stage by stage: proportional block
    // bounds by integer division, md5-parity bit per block, MSB-first
    // 32-bit words, 4×16-bit band buckets, full-Hamming verify.
    "mm_neardup" ->
      """WITH assets0 AS (
        |  SELECT doc_id AS asset_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS asset_id,
        |    concat(substr(text, 1, 9), 'Z', substr(text, 11, length(text))) AS text
        |  FROM documents WHERE doc_id % 20 = 0
        |), assets AS (
        |  -- minBytes=64 guard: sub-block-size payloads have degenerate
        |  -- signatures (ASCII corpus: octet length = char length)
        |  SELECT * FROM assets0 WHERE length(text) >= 64
        |), b AS (
        |  SELECT asset_id, i,
        |    CAST(CONCAT('0x', substr(md5(substr(text,
        |        CAST((i*length(text))//64 + 1 AS INT),
        |        CAST(((i+1)*length(text))//64 - (i*length(text))//64 AS INT))), 32, 1))
        |      AS INT) % 2 AS bit
        |  FROM assets CROSS JOIN range(64) t(i)
        |), su AS (
        |  SELECT asset_id,
        |    sum(CASE WHEN i < 32 THEN CAST(bit AS BIGINT) << CAST(31 - i AS INT) ELSE 0 END) AS w0,
        |    sum(CASE WHEN i >= 32 THEN CAST(bit AS BIGINT) << CAST(63 - i AS INT) ELSE 0 END) AS w1
        |  FROM b GROUP BY asset_id
        |), bands AS (
        |  SELECT asset_id, w0, w1, band,
        |    CASE band WHEN 0 THEN w0 // 65536 WHEN 1 THEN w0 % 65536
        |              WHEN 2 THEN w1 // 65536 ELSE w1 % 65536 END AS bucket
        |  FROM su CROSS JOIN range(4) t(band)
        |)
        |SELECT DISTINCT a.asset_id AS asset_id_a, b.asset_id AS asset_id_b,
        |  CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS BIGINT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.bucket = b.bucket AND a.asset_id < b.asset_id
        |WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3""".stripMargin)
}
