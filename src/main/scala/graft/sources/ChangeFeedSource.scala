package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.execution.streaming.{Source, Offset => OffsetV1}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sink.KeyedUpsertSink

/** Streaming change-feed source over a [[graft.sink.KeyedUpsertSink]]
  * versioned table: `spark.readStream.format("graft-changes")` makes the
  * engine's own storage tier a first-class event source — the
  * "Structured Streaming + event source connectors" mandate applied to
  * its own tables. Offsets ARE manifest versions: each micro-batch is
  * exactly `readChangesBetween(from, to]` (the upsert CDC — or the
  * weighted retraction feed with `weighted=true`), so a streamed feed
  * equals what a [[graft.sink.ChangeFeedConsumer]] poller would have
  * produced over the same version ranges, and the checkpointed offset
  * resumes precisely at the version the last committed batch ended on.
  *
  * Why the DSv1 `Source` seam and not a DSv2 `MicroBatchStream` (the
  * repo's other connector, [[SyntheticEventsProvider]], is DSv2): a
  * MicroBatchStream hands the engine per-partition ROW READERS, which
  * fits a source whose rows exist somewhere (files, a queue). The
  * change feed is a DERIVED relational computation — per-bucket chain
  * reads, an LWW window resolve, a symmetric difference — i.e. a
  * DataFrame, not a row iterator; forcing it through InputPartitions
  * would mean materializing every batch to scratch storage first.
  * `Source.getBatch` returns the feed's DataFrame directly and Spark
  * splices its (batch-scale, append-fast-path) plan into the streaming
  * query — the same reason Delta Lake's own table streaming source uses
  * this API. Both APIs are engine-public and checkpoint-compatible.
  *
  * Options:
  *  - `path` (required): the table root;
  *  - `keys` (optional): comma-separated key column names;
  *  - `orderBy` (optional): comma-separated LWW order column names.
  *    Tables written since the spec metadata exists are
  *    SELF-DESCRIBING: omit both and the stored spec
  *    ([[graft.sink.KeyedUpsertSink.storedSpec]]) applies — the safe
  *    default, since an `orderBy` that differs from the writer's
  *    resolves ties differently than the table's own reads. An explicit
  *    spec that MISMATCHES the stored one fails loudly (the readers
  *    validate); give both options or neither;
  *  - `weighted` (default false): emit the retraction feed (`__weight`
  *    = +1 new image / -1 superseded image) instead of upserts-only;
  *  - `startingVersion` (default: the head at source creation): stream
  *    changes strictly AFTER this committed version. The default tails
  *    new changes only; `startingVersion=0` replays the full history as
  *    the first batch (v0 = the empty pre-first-commit table, so
  *    (0, head] is a bootstrap);
  *  - `maxVersionsPerTrigger` (optional): admission control — cap how
  *    many manifest versions one micro-batch may cover, so a consumer
  *    restarted after a long stall catches up in bounded batches
  *    instead of one giant range;
  *  - `maxBucketsPerTrigger` (optional): SUB-version admission control
  *    — cap how many touched buckets one micro-batch may cover. A
  *    single giant commit (a compaction, a backfill — one version) is
  *    invisible to the version cap; with this cap it drains as
  *    consecutive bucket slices (the offset becomes
  *    `{"version":N,"bucketCursor":M}` mid-version — the Delta-style
  *    (version, file-index) offset idea, per bucket because this feed
  *    is derived per bucket; clean boundaries keep the plain long, so
  *    old checkpoints resume unchanged). A rebucket version cannot
  *    split (bucket ids are incomparable across layouts) and drains
  *    whole. Composes with `maxVersionsPerTrigger`.
  *
  * Retention contract (same as every feed reader): a batch whose `from`
  * version has been vacuum-pruned fails LOUDLY with `manifestAt`'s
  * error — never silently skips history. Size the table's vacuum keep
  * window to exceed the stream's worst-case downtime.
  *
  * Schema is fixed at stream start (the resolved table schema at the
  * head, footer-only reads). Columns ADDED by later commits surface
  * after a stream restart — the standard streaming-source contract —
  * with ranges whose generations predate a column serving typed nulls
  * there (what a batch read of those versions resolves under the
  * widened contract). Dropped/retyped columns cannot occur mid-stream:
  * the versioned committers refuse them at the writer
  * ([[graft.sink.KeyedUpsertSink.storedSchema]]'s contract).
  */
class ChangeFeedSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), ChangeFeedSource.feedSchema(sqlContext, parameters))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(sqlContext, parameters, metadataPath)

  /** The BATCH facade: `spark.read.format("graft-changes")` with
    * `fromVersion` (required) / `toVersion` (default head) — one
    * (from, to] CDC range as a plain DataFrame, so SQL-level users get
    * the feed without the Scala API. Library callers should prefer
    * [[graft.sink.KeyedUpsertSink.readChangesBetween]] directly: this
    * facade routes rows through a Row-typed `buildScan` RDD (the DSv1
    * relation contract), which pays an InternalRow↔Row round-trip the
    * direct DataFrame never does.
    */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation = {
    import ChangeFeedSource._
    val path = required(parameters, "path")
    val (keyCols, order) = resolveSpec(parameters)
    val from = parameters.getOrElse("fromVersion",
      throw new IllegalArgumentException(
        "graft-changes batch read requires 'fromVersion' (0 = full-history " +
          "bootstrap image); add .option(\"fromVersion\", ...) — an " +
          "unbounded batch read of a change feed is ambiguous")).toLong
    val to = parameters.get("toVersion").map(_.toLong)
    val weighted = parameters.get("weighted").exists(_.toBoolean)
    val feed =
      if (weighted) KeyedUpsertSink.readChangesWeighted(
        sqlContext.sparkSession, path, keyCols, order, from, to)
      else KeyedUpsertSink.readChangesBetween(
        sqlContext.sparkSession, path, keyCols, order, from, to)
    val ctx = sqlContext
    new org.apache.spark.sql.sources.BaseRelation
        with org.apache.spark.sql.sources.TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = feed.schema
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
        feed.rdd
    }
  }
}

/** Operational introspection over a `graft-changes` streaming query's
  * CHECKPOINT — the public entry point for retention sizing
  * ([[graft.sink.KeyedUpsertSink.adviseRetention]] composes it).
  */
object ChangeFeedSourceProvider {
  /** The (version, bucketCursor) position a checkpointed `graft-changes`
    * stream would RESUME from — i.e. the oldest table position its next
    * run still reads, which the table's vacuum retention must keep
    * alive. The last COMMITTED batch's end offset (an uncommitted
    * in-flight batch replays from exactly there); before any commit, the
    * persisted starting floor; None for a checkpoint no `graft-changes`
    * query ever started on. Loud on an unparseable offset log — an
    * advisor must not guess a retention bound.
    *
    * `sourceIndex` selects the source within a MULTI-source query (the
    * offset log carries one line per source in query order; a
    * two-feed join's second `graft-changes` source is index 1). The
    * default 0 is correct for every single-source query — passing the
    * wrong index against another graft feed is indistinguishable from
    * the right one, so multi-source callers must supply it.
    */
  def checkpointPosition(checkpointDir: String,
      sourceIndex: Int = 0): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    require(sourceIndex >= 0, s"sourceIndex must be >= 0 (got $sourceIndex)")
    val dir = ChangeFeedSource.resolveLocalPath(checkpointDir)
    def maxBatch(sub: String): Option[Long] = {
      val d = dir.resolve(sub)
      if (!Files.isDirectory(d)) None
      else {
        val s = Files.list(d)
        try s.iterator().asScala
          .flatMap(p => p.getFileName.toString.toLongOption).maxOption
        finally s.close()
      }
    }
    maxBatch("commits") match {
      case Some(b) =>
        val off = dir.resolve("offsets").resolve(b.toString)
        // OffsetSeqLog v1 layout: version header line, metadata JSON
        // line, then ONE offset line per source in query order. Index
        // the RAW lines — filtering blanks first would let an empty
        // metadata line shift every source down one and silently hand
        // back the WRONG source's position
        val lines = Files.readAllLines(off).asScala
        require(lines.size >= 3 + sourceIndex,
          s"$off: offset log has ${math.max(0, lines.size - 2)} source " +
            s"line(s) — no source at index $sourceIndex; was this " +
            "checkpoint written by the query you think it was?")
        Some(ChangeFeedSource.parseOffset(lines(2 + sourceIndex).trim))
      case None =>
        val floor = dir.resolve("sources").resolve(sourceIndex.toString)
          .resolve("graft-changes-start")
        if (Files.exists(floor))
          Some(ChangeFeedSource.parseOffset(new String(
            Files.readAllBytes(floor),
            java.nio.charset.StandardCharsets.UTF_8).trim))
        else None
    }
  }
}

private[graft] object ChangeFeedSource {
  val WeightCol = "__weight"

  /** With `versionColumns=true`, every batch row carries its range as
    * four constant columns — the only way a foreachBatch consumer (which
    * receives rows, not offsets) can anchor an exactly-once fold to the
    * manifest range the batch covers ([[graft.sink
    * .MaterializedAggView.maintainStream]] is the built-in consumer).
    * The CURSOR pair carries the sub-version position (0 at a clean
    * version boundary — every batch of an unsliced stream), so anchored
    * folds compose with `maxBucketsPerTrigger`: a slice batch anchors at
    * `(version, bucketCursor)` exactly like the offset it came from.
    * Cost: 32 bytes/row of literal payload, on an opt-in path.
    */
  val FromVersionCol = "__from_version"
  val ToVersionCol = "__to_version"
  val FromCursorCol = "__from_cursor"
  val ToCursorCol = "__to_cursor"

  /** `format` names the CALLING data source in errors — these helpers
    * are shared by graft-changes, graft-table and graft-upsert, and a
    * user of one must not be pointed at another.
    */
  def required(parameters: Map[String, String], key: String,
      format: String = "graft-changes"): String =
    parameters.getOrElse(key, throw new IllegalArgumentException(
      s"$format requires the '$key' option ('path' is mandatory; " +
        "'keys'/'orderBy' default to the table's stored spec)"))

  def csv(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty)

  /** The key/order spec this read runs under: the explicit `keys` +
    * `orderBy` options when BOTH are given (the sink readers then
    * validate them against the table's stored spec — a mismatch fails
    * loudly there), else the table's stored spec (loud when a pre-spec
    * table has none). Exactly one of the two options is a misuse —
    * half a spec can't be validated or defaulted coherently.
    */
  def resolveSpec(parameters: Map[String, String],
      format: String = "graft-changes")
      : (Seq[String], Seq[org.apache.spark.sql.Column]) = {
    val path = required(parameters, "path", format)
    (parameters.get("keys"), parameters.get("orderBy")) match {
      case (Some(k), Some(o)) => (csv(k), csv(o).map(col))
      case (None, None) => KeyedUpsertSink.storedSpec(path).getOrElse(
        throw new IllegalArgumentException(
          s"$path carries no key/order spec metadata (written before the " +
            "spec was recorded, or no versioned commit yet) — pass the " +
            "'keys' and 'orderBy' options explicitly; one commit with a " +
            "current writer records the spec"))
      case _ => throw new IllegalArgumentException(
        s"$format takes 'keys' and 'orderBy' together or neither " +
          "(neither = the table's stored spec) — exactly one of them " +
          "cannot be validated or defaulted coherently")
    }
  }

  /** A numeric option parsed with the option name in the failure — the
    * surface's loud-refusal style, instead of a bare
    * NumberFormatException pointing at nothing.
    */
  def longOption(parameters: Map[String, String], key: String,
      format: String): Option[Long] =
    parameters.get(key).map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$format: option '$key' must be an integer, got '$v'"))
    }

  /** A boolean option parsed with the option name in the failure —
    * a bare String.toBoolean's "For input string" names neither the
    * option nor the format. Case-insensitive on the KEY like the rest
    * of this surface's option reads.
    */
  def booleanOption(parameters: Map[String, String], key: String,
      format: String): Option[Boolean] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) =>
      v.trim.toLowerCase match {
        case "true" => true
        case "false" => false
        case _ => throw new IllegalArgumentException(
          s"$format: option '$key' must be true or false, got '$v'")
      }
    }

  /** Int-ranged numeric option — a raw `.toInt` after a long parse
    * silently WRAPS out-of-range values (numBuckets=4294967312 → 16),
    * which is worse than the typo it came from.
    */
  def intOption(parameters: Map[String, String], key: String,
      format: String): Option[Int] =
    longOption(parameters, key, format).map { v =>
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"$format: option '$key' is outside Int range: $v")
      v.toInt
    }

  /** Sub-version stream offset: `version` versions are fully emitted,
    * PLUS the first `cursor` buckets (of the sorted touched-bucket list)
    * of version `version + 1`. `cursor == 0` — a clean version boundary
    * — serializes as the plain long the pre-cursor checkpoints used, so
    * old checkpoints resume unchanged and a stream that never splits a
    * version writes the old format.
    */
  private[graft] case class BucketCursorOffset(version: Long, cursor: Long)
      extends OffsetV1 {
    override def json(): String =
      s"""{"version":$version,"bucketCursor":$cursor}"""
  }

  private val CursorOffsetRe =
    """\{\s*"version"\s*:\s*(\d+)\s*,\s*"bucketCursor"\s*:\s*(\d+)\s*\}""".r

  /** Parse either offset encoding: a plain long (clean boundary — the
    * pre-cursor format) or the cursor JSON.
    */
  private[graft] def parseOffset(json: String): (Long, Long) = {
    val t = json.trim
    t.toLongOption match {
      case Some(v) => (v, 0L)
      case None => t match {
        case CursorOffsetRe(v, c) => (v.toLong, c.toLong)
        case _ => throw new IllegalArgumentException(
          s"graft-changes: unparseable offset '$t' — expected a version " +
            "long or {\"version\":N,\"bucketCursor\":M}")
      }
    }
  }

  private[graft] def offsetOf(v: Long, c: Long): OffsetV1 =
    if (c == 0L) LongOffset(v) else BucketCursorOffset(v, c)

  /** A checkpoint/metadata location as a local NIO path. Spark hands
    * these around as URI strings (`file:/...`) — Paths.get on the raw
    * string would treat that as RELATIVE and scatter literal `file:`
    * directories under the CWD (or, for a reader, probe a path that
    * does not exist). Detect a URI by a successful parse WITH a scheme
    * and path — not a substring-colon test: a plain local path
    * containing `:`, or one with spaces or brackets, must fall back to
    * Paths.get, not throw an opaque URISyntaxException. EVERY consumer
    * of a checkpoint location string (the source's floor writer, the
    * view's floor guard, checkpointPosition) must resolve through this
    * ONE rule, or a `file:`-form location silently splits them onto
    * different directories.
    */
  private[graft] def resolveLocalPath(pathOrUri: String): java.nio.file.Path =
    try {
      val u = new java.net.URI(pathOrUri)
      if (u.getScheme != null && u.getPath != null) Paths.get(u.getPath)
      else Paths.get(pathOrUri)
    } catch {
      case _: java.net.URISyntaxException => Paths.get(pathOrUri)
    }

  /** The feed's schema: the resolved table schema at the current head
    * (+ `__weight` when weighted). Loud before the first commit — an
    * empty chain has no schema to stream.
    */
  def feedSchema(sqlContext: SQLContext, parameters: Map[String, String]): StructType = {
    val path = required(parameters, "path")
    require(KeyedUpsertSink.tableVersions(path).nonEmpty,
      s"$path has no committed versions — a change-feed stream needs at " +
        "least one commit to derive its schema (wrong path, or start the " +
        "stream after the first commit)")
    val (keys, order) = resolveSpec(parameters)
    val base = KeyedUpsertSink.readBucketedDelta(
      sqlContext.sparkSession, path, keys, order).schema
    val weighted =
      if (parameters.get("weighted").exists(_.toBoolean))
        StructType(base.fields :+ StructField(WeightCol, LongType, nullable = false))
      else base
    if (parameters.get("versionColumns").exists(_.toBoolean))
      StructType(weighted.fields :+
        StructField(FromVersionCol, LongType, nullable = false) :+
        StructField(ToVersionCol, LongType, nullable = false) :+
        StructField(FromCursorCol, LongType, nullable = false) :+
        StructField(ToCursorCol, LongType, nullable = false))
    else weighted
  }
}

private[graft] class ChangeFeedSource(
    sqlContext: SQLContext, parameters: Map[String, String],
    metadataPath: String)
    extends Source
    with streaming.SupportsAdmissionControl
    with streaming.SupportsTriggerAvailableNow {
  import ChangeFeedSource._

  private val tablePath = required(parameters, "path")
  // resolved once at source creation (explicit options, else the
  // table's stored spec) — the spec is immutable once recorded, so a
  // per-batch re-resolve would only re-read the same metadata
  private val (keys, orderCols) = resolveSpec(parameters)
  private val weighted = parameters.get("weighted").exists(_.toBoolean)
  private val versionCols = parameters.get("versionColumns").exists(_.toBoolean)
  private val maxVersions = parameters.get("maxVersionsPerTrigger").map { v =>
    val n = v.toLong
    require(n >= 1, s"maxVersionsPerTrigger must be >= 1 (got $n)")
    n
  }
  private val maxBuckets = parameters.get("maxBucketsPerTrigger").map { v =>
    val n = v.toLong
    require(n >= 1, s"maxBucketsPerTrigger must be >= 1 (got $n)")
    n
  }
  override val schema: StructType = feedSchema(sqlContext, parameters)

  /** The stream's floor: changes strictly after this version flow.
    *
    * PERSISTED under the query's `metadataPath` on first resolution
    * (put-if-absent, the Kafka-source `initialPartitionOffsets`
    * discipline): the engine re-runs an UNCOMMITTED batch 0 after a
    * crash as `getBatch(None, end)`, and a freshly-constructed source
    * whose defaulted floor re-resolved to the NEW head would serve
    * that replay an empty range — rows between the original floor and
    * `end` would be silently lost exactly when the sink never got
    * them. With the floor persisted, every restart of this query
    * recovers the same one.
    */
  private val startFloor: (Long, Long) = {
    // metadataPath arrives as a URI string (`file:/...`) from the
    // checkpoint manager — resolve through the ONE shared rule (see
    // [[ChangeFeedSource.resolveLocalPath]])
    val metaDir = resolveLocalPath(metadataPath)
    val persisted = metaDir.resolve("graft-changes-start")
    if (Files.exists(persisted))
      parseOffset(new String(Files.readAllBytes(persisted),
        java.nio.charset.StandardCharsets.UTF_8).trim)
    else {
      val floor: (Long, Long) = parameters.get("startingVersion") match {
        case Some(v) =>
          // either a plain version long (the documented form) or a
          // cursor offset JSON — the latter lets a consumer resume a
          // MID-VERSION position with a fresh checkpoint (the sliced
          // maintenance stream recovering a mid-version view watermark)
          val (n, c) = parseOffset(v)
          val head = KeyedUpsertSink.tableVersions(tablePath).max
          // fail at stream START with the real problem — a floor above
          // the head would otherwise surface later as a confusing
          // reversed-range error on the first batch
          require(n >= 0 && n <= head,
            s"startingVersion=$n is outside $tablePath's committed range " +
              s"[0, $head] — the floor must be an existing version (0 = " +
              "full-history bootstrap)")
          if (c > 0L) {
            // a cursor indexes version n+1's sorted touched-bucket list:
            // validate it is constructible NOW, not at the first batch
            require(n < head,
              s"startingVersion cursor ($n,$c) points inside v${n + 1}, " +
                s"which is beyond $tablePath's head v$head")
            val touched = KeyedUpsertSink.touchedBucketsAt(tablePath, n + 1)
              .getOrElse(throw new IllegalArgumentException(
                s"startingVersion cursor ($n,$c) points inside v${n + 1}, " +
                  "a layout-change version — slices are never " +
                  "constructible there"))
            require(c < touched.size,
              s"startingVersion cursor ($n,$c) is outside v${n + 1}'s " +
                s"touched-bucket list (${touched.size} buckets) — a " +
                s"completed version is the plain floor ${n + 1}")
          }
          (n, c)
        case None => (KeyedUpsertSink.tableVersions(tablePath).max, 0L)
      }
      Files.createDirectories(persisted.getParent)
      // lost race (a concurrent restart of the same query) → read the
      // winner's floor; both resolved it from the same parameters.
      // Clean floors keep the plain-long encoding (old guard readers
      // parse it); cursor floors persist the offset JSON.
      KeyedUpsertSink.putIfAbsent(persisted,
        s"${offsetOf(floor._1, floor._2).json()}\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      parseOffset(new String(Files.readAllBytes(persisted),
        java.nio.charset.StandardCharsets.UTF_8).trim)
    }
  }

  /** AvailableNow's drain target: the head frozen at prepare time, so
    * the query terminates even while new commits keep landing.
    */
  @volatile private var availableTarget: Option[Long] = None

  /** Per-version touched-bucket memo: a committed manifest is IMMUTABLE
    * (put-if-absent; vacuum deletes, never rewrites), so the diff for a
    * version never changes. Without this, a bucket-capped catch-up walk
    * re-lists the table root per probed version per trigger, and
    * getBatch repeats the listing for its own step — a listing storm on
    * an object store. Bounded: the walk only ever probes versions near
    * the stream's frontier, so a small window suffices.
    */
  private val touchedMemo =
    new java.util.LinkedHashMap[Long, Option[Seq[Long]]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Option[Seq[Long]]]): Boolean = size > 64
    }

  private def touchedAt(v: Long): Option[Seq[Long]] = touchedMemo.synchronized {
    val cached = touchedMemo.get(v)
    if (cached != null) cached
    else {
      val fresh = KeyedUpsertSink.touchedBucketsAt(tablePath, v)
      touchedMemo.put(v, fresh)
      fresh
    }
  }

  private def pos(o: streaming.Offset): (Long, Long) = parseOffset(o.json())

  private def currentHead: Long = {
    val versions = KeyedUpsertSink.tableVersions(tablePath)
    if (versions.isEmpty) throw new IllegalStateException(
      s"$tablePath has no committed versions — the table was deleted or " +
        "recreated under a running change-feed stream")
    versions.max
  }

  // ── admission control (the FileStreamSource pattern: a v1 Source that
  // implements SupportsAdmissionControl drives batch boundaries through
  // latestOffset(start, limit), with the committed offset passed IN — no
  // source-side offset bookkeeping to drift on restart)

  override def initialOffset(): streaming.Offset =
    offsetOf(startFloor._1, startFloor._2)

  override def deserializeOffset(json: String): streaming.Offset = {
    val (v, c) = parseOffset(json)
    offsetOf(v, c)
  }

  // the version/bucket caps are this source's own options, not a
  // row/file count — allAvailable + a self-applied cap in latestOffset
  // (how FileStream interprets its maxFilesPerTrigger under admission
  // control)
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.allAvailable()

  /** Batch-boundary policy. Plain `maxVersionsPerTrigger` caps whole
    * versions (the pre-cursor behavior, unchanged). With
    * `maxBucketsPerTrigger` the offset walks INSIDE a version: a
    * version whose touched-bucket list alone exceeds the cap drains as
    * consecutive bucket slices (`BucketCursorOffset`), so one giant
    * commit — a compaction, a backfill — no longer lands in a single
    * micro-batch; small versions still batch together up to the caps.
    * Invariants the construction maintains (getBatch relies on them):
    * a batch containing a cursor never spans more than one version
    * step, and a bucket slice never starts on a layout-change version
    * (those cannot split — they drain whole and terminate their batch).
    */
  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    // start is null on the stream's very first batch (the v1 admission-
    // control contract FileStreamSource also handles)
    val (v0, c0) = Option(start).map(pos).getOrElse(startFloor)
    val head = availableTarget.fold(currentHead)(math.min(currentHead, _))
    maxBuckets match {
      case None =>
        if (c0 > 0L)
          // the cap was removed on a restart mid-version: finish that
          // version first — getBatch's slice arithmetic stays one-step
          offsetOf(v0 + 1, 0L)
        else LongOffset(maxVersions.fold(head)(c => math.min(head, v0 + c)))
      case Some(bCap) =>
        if (c0 > 0L) {
          // mid-version: emit the next slice, or the remainder — and
          // terminate the batch at the boundary either way (a batch
          // never mixes a partial version with other versions)
          val touched = touchedAt(v0 + 1)
            .getOrElse(throw new IllegalStateException(
              s"$tablePath: checkpointed bucket cursor inside version " +
                s"${v0 + 1}, which spans a layout change — a slice can " +
                "never be constructed there; the checkpoint is from a " +
                "different table history"))
          if (touched.size - c0 > bCap) offsetOf(v0, c0 + bCap)
          else offsetOf(v0 + 1, 0L)
        } else {
          var v = v0
          var budget = bCap
          var versionsLeft = maxVersions.getOrElse(Long.MaxValue)
          var tookAny = false
          while (v < head && versionsLeft > 0L && budget > 0L) {
            touchedAt(v + 1) match {
              case None =>
                // layout-change version: not splittable — take it whole
                // when it's the batch's first content, else stop before
                // it; either way it terminates the batch
                if (!tookAny) v += 1
                return offsetOf(v, 0L)
              case Some(touched) =>
                if (touched.size <= budget) {
                  v += 1; budget -= touched.size; versionsLeft -= 1
                  tookAny = true
                } else if (!tookAny) {
                  // the first version alone exceeds the cap: slice it
                  return offsetOf(v, budget)
                } else return offsetOf(v, 0L)
            }
          }
          offsetOf(v, 0L)
        }
    }
  }

  override def reportLatestOffset(): streaming.Offset = LongOffset(currentHead)

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(currentHead)

  /** Unused once SupportsAdmissionControl is implemented (the engine
    * calls latestOffset instead), but Source declares it abstract.
    */
  override def getOffset: Option[OffsetV1] = {
    val head = currentHead
    if (head > startFloor._1) Some(LongOffset(head)) else None
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val (toV, toC) = pos(end: streaming.Offset)
    // start=None is either the stream's true first batch (floor =
    // startVersion) or the engine's RECOVERY replay of an
    // already-committed batch, where this fresh source's floor (head at
    // creation) can sit ABOVE the old batch's end — clamp, the replayed
    // frame only rebuilds source state and an empty feed carries the
    // schema either way
    val (from, fromC) = start.map(o => pos(o: streaming.Offset))
      .getOrElse {
        // lexicographic clamp of the (possibly mid-version) floor
        if (startFloor._1 < toV ||
          (startFloor._1 == toV && startFloor._2 <= toC)) startFloor
        else (toV, toC)
      }
    // LAZY leaf (round 18): everything below — the feed construction
    // AND its AQE-eager toRdd — defers until the engine actually
    // computes the returned frame. The engine's restart recovery calls
    // getBatch on the last COMMITTED range and discards the result;
    // with an eager leaf that re-planned (and re-shuffled) the whole
    // last batch per restart (measured in tools/DeleteScale: a
    // half-table bootstrap batch re-paid on every restart until the
    // next commit moved the basis; flat after this change). A real
    // batch forces the thunk exactly once, at execution; the
    // constructible-range requires below fire there with the same
    // messages.
    org.apache.spark.sql.graft.Bridge.lazyStreamingLeafDataFrame(
      sqlContext.sparkSession, schema) {
    // engine contract: a constructed batch always has from < to, but a
    // degenerate range must still return the declared schema
    val feed =
      if (fromC == 0L && toC == 0L)
        // clean version boundaries: the plain range feed
        if (weighted) KeyedUpsertSink.readChangesWeighted(
          sqlContext.sparkSession, tablePath, keys, orderCols,
          fromVersion = from, toVersion = Some(toV))
        else KeyedUpsertSink.readChangesBetween(
          sqlContext.sparkSession, tablePath, keys, orderCols,
          fromVersion = from, toVersion = Some(toV))
      else {
        // a cursor batch covers exactly ONE version step (the
        // latestOffset construction invariant): the slice [fromC, toC)
        // — or [fromC, end) when the batch completes the version — of
        // that version's sorted touched-bucket list
        val stepV = if (toC > 0L) toV + 1 else toV
        require(from == (if (toC > 0L) toV else toV - 1),
          s"$tablePath: cursor batch spans more than one version step " +
            s"(($from,$fromC) -> ($toV,$toC)) — not a constructible range")
        val touched = touchedAt(stepV)
          .getOrElse(throw new IllegalStateException(
            s"$tablePath: bucket slice inside version $stepV, which " +
              "spans a layout change — not a constructible range"))
        val hi = if (toC > 0L) toC.toInt else touched.size
        KeyedUpsertSink.readChangesSlice(
          sqlContext.sparkSession, tablePath, keys, orderCols, stepV,
          touched.slice(fromC.toInt, hi).toSet, weighted)
      }
    // the range anchors for an exactly-once foreachBatch consumer — as
    // constant columns, because the v1 contract hands the consumer rows,
    // not offsets
    val anchored =
      if (!versionCols) feed
      else feed
        .withColumn(FromVersionCol, org.apache.spark.sql.functions.lit(from))
        .withColumn(ToVersionCol, org.apache.spark.sql.functions.lit(toV))
        .withColumn(FromCursorCol, org.apache.spark.sql.functions.lit(fromC))
        .withColumn(ToCursorCol, org.apache.spark.sql.functions.lit(toC))
    // pin the declared column set (a commit that ADDED columns mid-stream
    // widens the feed, but this stream's schema is fixed until restart).
    // The converse alignment matters on RESTART after a widening commit:
    // this fresh source's schema is the WIDE one, but a replayed (or
    // straddling) range whose generations predate the new column yields
    // a narrower feed — pad it with typed nulls, exactly what a batch
    // read of those versions resolves under the widened contract. Then
    // re-tag as a streaming leaf — the v1 getBatch contract.
    val aligned = schema.fields.foldLeft(anchored) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name,
        org.apache.spark.sql.functions.lit(null).cast(f.dataType))
    }
    aligned.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  override def stop(): Unit = ()
}
