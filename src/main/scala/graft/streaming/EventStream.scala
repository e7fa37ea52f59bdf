package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the event stream — the Spark-native
  * generalization of the reference's event bus (SURVEY.md §1.5: the
  * S3→SQS→EventBridge chain maps to a watched-source stream; the
  * reference itself is processing-time-only with no windows or state,
  * so watermarked windows/sessions/stateful-LWW are the north-star
  * extension of that surface).
  *
  * Each operator here is the streaming twin of a batch operator in
  * graft.events.EventAnalytics; StreamingSpec asserts stream/batch parity
  * on the same input. At scale: state is keyed exactly like the batch
  * shuffles (window×type, user), so the state store partitions the same
  * way the batch plan does; watermarks bound state size.
  */
object EventStream {

  /** The raw events schema with legacy nano-epoch `ts` carried as long
    * (fixture generations that write parquet TIMESTAMP(NANOS), scanned
    * via nanosAsLong).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The raw events schema with `ts` as parquet timestamp[us] (scans as
    * TIMESTAMP_NTZ) — the current driver-fixture encoding.
    */
  val eventsSchemaMicros: StructType = StructType(
    eventsSchema.fields.map {
      case f if f.name == "ts" => f.copy(dataType = TimestampNTZType)
      case f                   => f
    })

  /** Streaming source over a directory of event parquet files — the
    * arrival-notification analogue (new-file listing ≈ S3→SQS,
    * `maxFilesPerTrigger` ≈ the reference's concurrency throttle O2).
    * Derives the same µs/ms/timestamp forms as Tables.events.
    *
    * A stream needs its schema up front, but the fixture's physical `ts`
    * encoding varies across generations (long nanos vs timestamp[us]), so
    * we peek the batch-scan schema of whatever files already exist — a
    * driver-side footer read, no data scan — and fall back to the current
    * µs encoding for an as-yet-empty directory. Normalization is shared
    * with the batch loader (graft.Tables.normalizeEventTs), so stream and
    * batch can never diverge on encoding handling.
    *
    * HARD CONTRACT for the empty-at-start fallback: files that later land
    * in the directory must be timestamp[us]/NTZ-encoded — the schema is
    * pinned at stream declaration and cannot re-dispatch. Legacy
    * NANOS-as-long arrivals under the pinned µs schema either fail the
    * parquet conversion outright or decode to absurd epochs; the fallback
    * path adds a per-row sanity gate on the decoded µs value
    * ([1980, 2100]) that aborts with a FIXTURE DRIFT message instead of
    * silently corrupting downstream event-time logic.
    */
  def fromParquetDir(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 4): DataFrame = {
    val inferred = scala.util.Try(spark.read.parquet(path).schema)
    val raw = spark.readStream
      .schema(inferred.getOrElse(eventsSchemaMicros))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
    // guard the RAW ts in the fallback case, so every derived column
    // (ts_us/ts_ms/ts_utc) flows through it: 1980-01-01 .. 2100-01-01 —
    // a misdeclared encoding lands ~×1000 outside on one side
    val guarded = if (inferred.isSuccess) raw
      else raw.withColumn("ts",
        when(col("ts").between(
          lit("1980-01-01").cast(TimestampNTZType),
          lit("2100-01-01").cast(TimestampNTZType)), col("ts"))
          .otherwise(raise_error(concat(lit(
            s"FIXTURE DRIFT: events stream at $path assumed timestamp[us] on an " +
              "empty directory, but an arriving file decoded ts outside " +
              "[1980,2100] (got "), col("ts").cast("string"),
            lit(") — physical ts encoding drifted; re-create the stream to re-infer")))))
    graft.Tables.normalizeEventTs(guarded)
  }

  /** Tumbling daily counts per event type with a watermark — the streaming
    * twin of EventAnalytics.tumblingDaily. Map-side partial aggregation
    * feeds keyed state; the shuffle carries (window × type) groups.
    */
  def tumblingDaily(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // final cast to double matches the batch twin's output contract
        // (EventAnalytics.tumblingDaily / Queries.outDouble rationale)
        sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
          .cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: every event within `windowSec` AFTER a
    * user's anchor event (attribution: "what followed the purchase") —
    * the streaming twin of EventAnalytics.rangeJoinAfter. Both sides are
    * watermarked and the join condition bounds event-time distance, so
    * Spark evicts join state on both sides once the watermark passes —
    * bounded state at any stream length. Matches emit in Append mode.
    */
  def rangeJoinAfter(
      events: DataFrame,
      anchorType: String,
      windowSec: Int,
      watermark: String = "1 hour"): DataFrame = {
    val anchors = events.filter(col("event_type") === anchorType)
      .select(col("user_id"), col("event_id").as("anchor_event_id"),
        col("ts_us").as("anchor_ts_us"), col("ts_utc").as("anchor_ts"))
      .withWatermark("anchor_ts", watermark)
    val others = events
      .select(col("user_id").as("o_user_id"), col("event_id").as("other_event_id"),
        col("event_type").as("other_type"), col("ts_us").as("other_ts_us"),
        col("ts_utc").as("other_ts"))
      .withWatermark("other_ts", watermark)
    anchors.join(others,
      col("user_id") === col("o_user_id")
        && col("other_ts") > col("anchor_ts")
        && col("other_ts") <= col("anchor_ts") + expr(s"INTERVAL $windowSec SECONDS")
        // µs-exact bound on top of the coarse event-time range (ts_utc is
        // µs-truncated already, but keep the contract explicit)
        && col("other_ts_us") > col("anchor_ts_us")
        && col("other_ts_us") <= col("anchor_ts_us") + windowSec * 1000000L)
      .select(col("user_id"), col("anchor_event_id"), col("other_event_id"),
        col("other_type"), (col("other_ts_us") - col("anchor_ts_us")).as("dt_us"))
  }

  /** Session windows per user (gap-based) — the streaming twin of
    * EventAnalytics.sessionize, via the native session_window operator.
    *
    * Boundary parity: the batch rule starts a new session only when
    * `ts - prev > gap` (STRICT — two events exactly gap apart share a
    * session). `session_window` matches it exactly: Spark merges
    * sessions whose ranges TOUCH (next.start ≤ current.end of the
    * [ts, ts+gap) range), i.e. merge ⟺ diff ≤ gap — pinned by the
    * exact-gap/gap+1µs boundary case in EventStreamSpec.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_utc", watermark)
      .groupBy(session_window(col("ts_utc"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min("ts_ms").as("session_start_ms"),
        max("ts_ms").as("session_end_ms"))
      .select(col("user_id"), col("n_events"),
        col("session_start_ms"), col("session_end_ms"))

  /** Typed state for the streaming keyed-LWW upsert. */
  case class UserLast(user_id: Long, last_event_id: Long,
      last_event_type: String, last_ts_ms: Long, ts_us: Long)

  /** Streaming keyed last-write-wins via mapGroupsWithState — the
    * streaming twin of EventAnalytics.latestPerUser and the stateful form
    * of the reference's DynamoDB upsert (K1, load.ts:61-78): state holds
    * exactly one row per key; each micro-batch folds in arrivals with the
    * same (ts_us, event_id) ordering the batch query uses.
    */
  def latestPerUser(events: DataFrame): Dataset[UserLast] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_ms"), col("ts_us"))
      .as[(Long, Long, String, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserLast, UserLast](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[UserLast]) =>
          val incoming = rows.map { case (u, id, tpe, ms, us) =>
            UserLast(u, id, tpe, ms, us)
          }
          val all = state.getOption.iterator ++ incoming
          val best = all.maxBy(r => (r.ts_us, r.last_event_id))
          state.update(best)
          best
      }
  }

  /** Streaming funnel detection via flatMapGroupsWithState (Append mode:
    * zero-or-one emission per user, in the first batch where membership
    * holds) — the streaming twin of EventAnalytics.funnel's membership
    * semantics (`max(to-ts) > min(from-ts)`, strict).
    *
    * That predicate is MONOTONE in the event set — later arrivals can
    * only turn it on, never off — so the state is two watermark-free
    * longs per user and NO arrival order can drop a hit: a to-event
    * delivered in an earlier micro-batch than its event-time-earlier
    * from-event qualifies the user the moment the from lands (a
    * consume-on-sight formulation would lose exactly that case).
    */
  case class FunnelState(minFromUs: Option[Long], maxToUs: Option[Long],
      emitted: Boolean)
  case class FunnelHit(user_id: Long)

  def funnelDetect(events: DataFrame, from: String, to: String): Dataset[FunnelHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin(from, to))
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(
            FunnelState(None, None, emitted = false))
          rows.foreach { case (_, tpe, us) =>
            if (tpe == from && s.minFromUs.forall(_ > us))
              s = s.copy(minFromUs = Some(us))
            else if (tpe == to && s.maxToUs.forall(_ < us))
              s = s.copy(maxToUs = Some(us))
          }
          val qualifies =
            s.minFromUs.exists(f => s.maxToUs.exists(_ > f))
          val emitNow = qualifies && !s.emitted
          if (emitNow) s = s.copy(emitted = true)
          state.update(s)
          if (emitNow) Iterator(FunnelHit(user)) else Iterator.empty
      }
  }

  /** Streaming as-of join state: rights (anchor candidates) still
    * reachable by a future left, and lefts awaiting watermark
    * finalization. Tuples are (ts_us, event_id, ts_ms).
    */
  case class AsofState(rights: List[(Long, Long, Long)],
      lefts: List[(Long, Long, Long)])

  /** One finalized as-of match (nullable anchor — same contract as the
    * batch twin's output row).
    */
  case class AsofHit(event_id: Long, user_id: Long, ts_ms: Long,
      asof_event_id: java.lang.Long, asof_ts_ms: java.lang.Long)

  /** EVENT-TIME-CORRECT streaming as-of join — the streaming twin of
    * EventAnalytics.asofJoin (every `leftType` event matched to the
    * user's latest `rightType` event at-or-before it; Spark has no
    * native as-of in either mode). The hard part is out-of-order
    * arrival: a left CANNOT be matched on sight, because a later batch
    * may deliver an earlier right. So lefts buffer in state and
    * finalize only once the watermark passes their event time — at
    * that point any better-matching right would be watermark-late and
    * inadmissible, so the match equals the batch join's by
    * construction. Tie discipline matches the batch twin exactly:
    * inclusive at equal ts_us, max event_id among equal-ts rights.
    *
    * Mechanics: flatMapGroupsWithState in Append mode with an
    * event-time timeout — a group with pending lefts re-arms a timer
    * just past its earliest pending left, so finalization happens on
    * watermark advance even if the user never sends another event.
    * State is watermark-bounded on both sides: lefts leave at
    * finalization, rights evict down to the single floor anchor
    * at-or-below the watermark (the one a future left may still need)
    * plus the in-horizon tail.
    */
  def asofJoinStream(events: DataFrame, leftType: String, rightType: String,
      watermark: String = "1 hour"): Dataset[AsofHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      // NOTE the watermark sits logically before the type filter, but
      // Catalyst still PUSHES the filter into the scan — rows of other
      // types never reach the watermark operator and do NOT advance
      // event time. To force finalization on a quiet stream, send an
      // admissible-type sentinel (a far-future right-side event is
      // inert: rights emit nothing from state) rather than a
      // foreign-type heartbeat (AsofStreamSpec shows the pattern).
      .withWatermark("ts_utc", watermark)
      .filter(col("event_type").isin(leftType, rightType))
      // ts_utc rides along untouched: the event-time-timeout check
      // requires the watermark-tagged column in the operator's input
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"), col("ts_ms"), col("ts_utc"))
      .as[(Long, String, Long, Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[AsofState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          var s = state.getOption.getOrElse(AsofState(Nil, Nil))
          rows.foreach { case (_, tpe, us, id, ms, _) =>
            // watermark-late data is inadmissible (it could contradict
            // already-finalized matches — a finalized left's redelivery
            // is always below the watermark, so it can never re-enter);
            // in-horizon redelivery dedups against the buffer, making
            // replay a state-side no-op — same contract as Spark's own
            // stateful operators
            if (wmMs == 0L || ms >= wmMs) {
              if (tpe == rightType) {
                if (!s.rights.exists(_._2 == id))
                  s = s.copy(rights = (us, id, ms) :: s.rights)
              } else if (!s.lefts.exists(_._2 == id))
                s = s.copy(lefts = (us, id, ms) :: s.lefts)
            }
          }
          // finalize lefts strictly below the watermark: no admissible
          // right can change their match anymore
          val (ready, pending) = s.lefts.partition(_._3 < wmMs)
          val out = ready.sortBy(l => (l._1, l._2)).map { case (lus, lid, lms) =>
            val m = s.rights.filter(_._1 <= lus)
            val best = if (m.isEmpty) None else Some(m.maxBy(r => (r._1, r._2)))
            AsofHit(lid, user, lms,
              best.map(r => Long.box(r._2)).orNull,
              best.map(r => Long.box(r._3)).orNull)
          }
          // evict rights: keep the floor anchor at-or-below the
          // watermark plus everything newer
          val (old, fresh) = s.rights.partition(_._3 < wmMs)
          val floor = if (old.isEmpty) Nil
            else List(old.maxBy(r => (r._1, r._2)))
          s = AsofState(fresh ++ floor, pending)
          if (s.rights.isEmpty && s.lefts.isEmpty) state.remove()
          else {
            state.update(s)
            if (s.lefts.nonEmpty)
              // re-arm just past the earliest pending left (must exceed
              // the current watermark or Spark rejects the timestamp)
              state.setTimeoutTimestamp(
                math.max(s.lefts.map(_._3).min, wmMs) + 1L)
          }
          out.iterator
      }
  }

  /** One not-yet-finalized burst: its interval plus the event_ids it
    * absorbed (the id list is the redelivery guard AND the exact
    * n_events count; it lives only as long as the burst is open —
    * finalized ids never need tracking because their redelivery is
    * watermark-late and inadmissible).
    */
  case class BurstSpan(lo: Long, hi: Long, ids: List[Long])
  case class BurstState(open: List[BurstSpan], nextId: Long)
  case class BurstOut(burst_id: Long, lo: Long, hi: Long, n_events: Long)

  /** EVENT-TIME-CORRECT streaming bursts — the streaming twin of
    * EventAnalytics.globalBursts (consecutive events of one type closer
    * than `gapMs` merge into [lo, hi] intervals; `burst_id` is the
    * 1-based time-order ordinal). The hard part is that a burst is a
    * RETROSPECTIVE construct: a new event can arrive that bridges two
    * intervals believed separate, so nothing can be emitted on sight.
    * Open intervals buffer in state and finalize only once the
    * watermark passes `hi + gapMs` — any event that could still extend
    * or bridge them would be watermark-late and inadmissible, so the
    * finalized set equals the batch operator's by construction.
    *
    * burst_id correctness without a global pass: open spans are
    * pairwise > gapMs apart, so lo-order == hi-order, and a span can
    * finalize only after every earlier span has (hi_j + gap < lo_k <
    * hi_k + gap < wm) — finalization order IS time order, and a
    * per-state counter hands out exactly the batch ordinals.
    *
    * Scale shape: state is the OPEN spans only — bounded by the
    * disorder horizon × burst density, never stream length; each span
    * carries its ids (exact count + replay absorption), bounded by
    * burst size. Like the batch twin, the operator targets the
    * FILTERED sparse stream (one event type ⇒ one state group); dense
    * multi-type tracking would key the same state machine by type.
    * A quiet stream finalizes via the event-time timer re-armed to the
    * earliest open `hi + gap`; to drive the watermark on a test
    * stream, send a far-future SAME-type sentinel — it opens a span
    * whose own finalization horizon is beyond the watermark it
    * creates, so it never pollutes the output (BurstStreamSpec).
    */
  def burstStream(events: DataFrame, eventType: String, gapMs: Long,
      watermark: String = "1 hour"): Dataset[BurstOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_utc", watermark)
      .filter(col("event_type") === eventType)
      .select(col("ts_ms"), col("event_id"), col("ts_utc"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[BurstState, BurstOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[BurstState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          var s = state.getOption.getOrElse(BurstState(Nil, 1L))
          rows.foreach { case (ms, id, _) =>
            // watermark-late rows are inadmissible (they could bridge or
            // extend already-finalized bursts); in-horizon redelivery
            // is absorbed by the open spans' id lists
            if ((wmMs == 0L || ms >= wmMs) &&
                !s.open.exists(_.ids.contains(id))) {
              // a point touches ≤2 spans (they sit > gap apart); merging
              // everything within gap is exactly the batch gap rule
              val (touch, rest) = s.open.partition(sp =>
                ms >= sp.lo - gapMs && ms <= sp.hi + gapMs)
              val merged = BurstSpan(
                (ms :: touch.map(_.lo)).min, (ms :: touch.map(_.hi)).max,
                id :: touch.flatMap(_.ids))
              s = s.copy(open = merged :: rest)
            }
          }
          // finalize spans no admissible event can ever reach
          val (done, open) = s.open.partition(_.hi + gapMs < wmMs)
          val out = done.sortBy(_.lo).zipWithIndex.map { case (sp, i) =>
            BurstOut(s.nextId + i, sp.lo, sp.hi, sp.ids.size.toLong)
          }
          s = BurstState(open, s.nextId + done.size)
          // the ordinal counter must outlive quiet periods: drop state
          // only if no burst was ever finalized (nextId still 1)
          if (s.open.isEmpty && s.nextId == 1L) state.remove()
          else {
            state.update(s)
            if (s.open.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(s.open.map(_.hi + gapMs).min, wmMs) + 1L)
          }
          out.iterator
      }
  }

  /** Streaming exact dedup: drop events whose event_id was already seen —
    * the streaming form of the training-pipeline exact-dedup operator,
    * and the general version of the at-least-once absorption the
    * reference gets from idempotent PutItem (SURVEY.md §1.4).
    *
    * STATE IS UNBOUNDED here by design: `dropDuplicates` on a key subset
    * that excludes the event-time column never evicts (the watermark
    * only bounds state when the event-time column is part of the dedup
    * key), so this variant holds one entry per DISTINCT event_id ever
    * seen — the configuration when a duplicate may arrive arbitrarily
    * late and must still drop. For unbounded keyspaces on long-running
    * streams use [[dedupEventsBounded]], which holds only the
    * redelivery horizon.
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts_utc", watermark).dropDuplicates("event_id")

  /** Bounded-state variant: dropDuplicatesWithinWatermark evicts each
    * key's state as soon as the watermark passes its event time — the
    * configuration for unbounded keyspaces (every event_id is unique
    * forever, so plain dropDuplicates state would grow without bound;
    * within-watermark dedup holds only the redelivery horizon).
    */
  def dedupEventsBounded(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts_utc", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** transformWithState (Spark 4's arbitrary-state API, RocksDB-only):
    * per-user running event count held in a ValueState. The modern
    * replacement for mapGroupsWithState — typed state handles, per-state
    * TTL, timers — shown here in its simplest useful form; the streaming
    * twin of `events.groupBy(user).count()` with incremental emission.
    */
  case class UserCount(user_id: Long, n: Long)

  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), UserCount] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator(UserCount(key, n))
    }
  }

  def runningCounts(events: DataFrame): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id")).as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Run any of the above to a named in-memory sink and block until all
    * available input is processed — the deterministic harness used by
    * tests and local replays.
    */
  def runToMemory(df: DataFrame, queryName: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .start()
    // stop even when a micro-batch fails (e.g. a fixture-drift
    // raise_error) — a failed-but-unstopped query would keep its state
    // store and listener registrations alive for the session
    try q.processAllAvailable()
    finally q.stop()
  }
}
