package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics over the event stream — the Spark-native generalization of
  * the reference's event-bus surface (SURVEY.md §2.2, §2.4).
  *
  * The reference routes envelope events with conjunctive equality rules and
  * terminates in a keyed last-write-wins store; everything here is the same
  * shape expressed as declarative plans Catalyst can optimize:
  *  - routing      → pushed-down filters (graft.route.Rules)
  *  - keyed upsert → one shuffle on the key, `row_number` LWW
  *  - observe/tally→ partial-aggregated `groupBy` (map-side combine)
  *
  * Scale notes: sessionize and LWW shuffle once on `user_id` — at 100 TB
  * that is the unavoidable key-repartition any stateful consumer would pay;
  * AQE handles skewed users. Tumbling windows aggregate with map-side
  * partials, so the shuffle carries only (window × type) groups, not rows.
  */
object EventAnalytics {

  /** K1 as a query: last event per key, LWW by (ts, event_id) — the exact
    * set-semantics of the reference's PutItem upsert (load.ts:61-78).
    */
  def latestPerUser(events: DataFrame): DataFrame = {
    // µs precision, not ns: see Tables.events (oracle engines agree at µs)
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("ts_ms").as("last_ts_ms"))
  }

  /** K3/README "tally": per-type reconciliation counts over the bus. */
  def tally(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min("ts_ms").as("first_ts_ms"),
        max("ts_ms").as("last_ts_ms"))

  /** Sessionization: a new session starts when the gap since the user's
    * previous event exceeds `gapMinutes`. Batch analogue of Structured
    * Streaming `session_window`; one shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gapUs = gapMinutes * 60L * 1000L * 1000L
    val marked = events.withColumn("prev_ts",
        lag("ts_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_ms").as("session_start_ms"),
        max("ts_ms").as("session_end_ms"))
  }

  /** Global burst intervals of one event type: consecutive events closer
    * than `gapMs` merge into one [lo, hi] interval (the sessionize gap
    * rule without the user key — "error bursts", "deploy windows").
    * `burst_id` is the 1-based ordinal of the burst in time order —
    * identical to a global lag/cumsum replay.
    *
    * Shard-merge construction (no unpartitioned window anywhere):
    *  1. events shard on fixed time buckets `ts_ms div shardMs`; local
    *     bursts come from the usual lag/cumsum under a window
    *     PARTITIONED by shard — the per-event work is fully parallel.
    *  2. one summary row per non-empty shard (first interval's lo, last
    *     interval's hi, local-burst count k) feeds a coordinator-scale
    *     pass: `joins_prev(s)` = does the shard's first local burst
    *     continue the previous non-empty shard's last one, and
    *     `off(s)` = exclusive running sum of per-shard NEW-burst counts
    *     `k − [joins_prev]`. This window IS single-partition by intent
    *     (partitioned on a constant) — but over shard-count rows, i.e.
    *     timespan/shardMs metadata, never events. Two local bursts in
    *     the same shard are > gapMs apart by construction, and the only
    *     cross-shard predecessor of a shard's first event is the last
    *     event of the previous non-empty shard, so `joins_prev` is the
    *     complete link rule (empty shards in between are fine — the lag
    *     skips them and the lo/hi comparison is direct).
    *  3. the global ordinal has a closed form from those two numbers —
    *     burst_id = off(shard) + lid − [joins_prev(shard)] — so a
    *     broadcast join of the summaries back to the local intervals
    *     plus a hash groupBy(burst_id) (min/max/sum merges the chained
    *     pieces) finishes distributed.
    * A chain spanning many shards collapses correctly: off(s) equals
    * the previous shard's tail ordinal whenever joins_prev(s), so every
    * link in the chain lands on the same burst_id (spec'd against the
    * direct global-window replay, including multi-shard chains).
    */
  def globalBursts(events: DataFrame, eventType: String, gapMs: Long,
      shardMs: Long = 0L): DataFrame = {
    require(gapMs > 0, s"gap must be positive: $gapMs")
    // default shard ≈ 64 gaps wide: shards stay ≫ burst scale (few
    // cross-shard links) while shard count stays metadata-scale
    val w = if (shardMs > 0) shardMs else gapMs * 64
    val wS = Window.partitionBy("shard").orderBy("ts_ms", "event_id")
    val local = events.filter(col("event_type") === eventType)
      .select(col("ts_ms"), col("event_id"), expr(s"ts_ms div ${w}L").as("shard"))
      .withColumn("prev", lag("ts_ms", 1).over(wS))
      .withColumn("nb",
        when(col("prev").isNull || col("ts_ms") - col("prev") > gapMs, 1)
          .otherwise(0))
      .withColumn("lid", sum("nb").over(
        wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy("shard", "lid")
      .agg(min("ts_ms").as("lo"), max("ts_ms").as("hi"),
        count(lit(1)).as("n"))
    // one row per non-empty shard; constant partition = deliberate
    // single-reducer metadata pass (see scaladoc), not an event sort.
    // pmod(shard,1) ≡ 0 but is non-foldable: a literal key would be
    // constant-folded out of the spec, reinstating the unpartitioned
    // window (and its all-events WARN shape) this operator exists to kill
    val wMeta = Window.partitionBy(pmod(col("shard"), lit(1L))).orderBy("shard")
    val summaries = local.groupBy("shard")
      .agg(min("lo").as("first_lo"), max("hi").as("last_hi"), max("lid").as("k"))
      .withColumn("prev_hi", lag("last_hi", 1).over(wMeta))
      .withColumn("joins_prev",
        col("prev_hi").isNotNull && col("first_lo") - col("prev_hi") <= gapMs)
      .withColumn("off", coalesce(
        sum(col("k") - when(col("joins_prev"), 1L).otherwise(0L)).over(
          wMeta.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "joins_prev", "off")
    local.join(broadcast(summaries), "shard")
      .withColumn("burst_id",
        col("off") + col("lid") - when(col("joins_prev"), 1L).otherwise(0L))
      .groupBy("burst_id")
      .agg(min("lo").as("lo"), max("hi").as("hi"), sum("n").as("n_events"))
  }

  /** The direct single-window form of [[globalBursts]] — the replay
    * oracle its spec checks the shard-merge construction against. Not
    * wired to any query: the unpartitioned window sorts the whole
    * filtered stream on one task.
    */
  private[graft] def globalBurstsDirect(events: DataFrame, eventType: String,
      gapMs: Long): DataFrame = {
    val w = Window.orderBy(col("ts_ms"), col("event_id"))
    events.filter(col("event_type") === eventType)
      .withColumn("prev", lag("ts_ms", 1).over(w))
      .withColumn("nb",
        when(col("prev").isNull || col("ts_ms") - col("prev") > gapMs, 1)
          .otherwise(0))
      .withColumn("burst_id", sum("nb").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy("burst_id")
      .agg(min("ts_ms").as("lo"), max("ts_ms").as("hi"),
        count(lit(1)).as("n_events"))
  }

  /** Keyless interval-overlap join via grid bucketing — the two-sided
    * interval join Spark's optimizer cannot plan as anything but a
    * nested-loop: `a` rows (a_id, a_lo, a_hi) paired with `b` rows
    * (b_id, b_lo, b_hi) whenever the closed intervals overlap.
    *
    * Scale shape (the standard spatial-grid construction, 1-D): each
    * interval fans out to its covered grid cells (⌈len/grid⌉+1 rows of
    * three longs — the payload never fans out), the join runs per cell
    * as an equi-hash-join, and the emit-once rule keeps exactly the
    * copy in the cell containing max(a_lo, b_lo) — every overlapping
    * pair meets there and only there, so no distinct/shuffle-dedup is
    * ever needed. Work is Σ per-cell |A_cell|·|B_cell|: grid should
    * sit near the typical interval length (too coarse → dense cells,
    * too fine → fan-out rows). All arithmetic is integer, so the
    * operator hash-checks against a plain overlap-predicate replay.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, gridMs: Long): DataFrame = {
    require(gridMs > 0, s"grid must be positive: $gridMs")
    val ac = a.select(col("a_id"), col("a_lo"), col("a_hi"),
      explode(sequence(expr(s"a_lo div ${gridMs}L"), expr(s"a_hi div ${gridMs}L")))
        .as("cell"))
    val bc = b.select(col("b_id"), col("b_lo"), col("b_hi"),
      explode(sequence(expr(s"b_lo div ${gridMs}L"), expr(s"b_hi div ${gridMs}L")))
        .as("cell"))
    ac.join(bc, Seq("cell"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .filter(col("cell") === expr(s"greatest(a_lo, b_lo) div ${gridMs}L"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
          .as("overlap_ms"))
  }

  /** Which user sessions were live during an error burst — the composed
    * demo of [[globalBursts]] ⋈ [[sessionize]] through
    * [[intervalOverlapJoin]] (hour grid). Session identity rides the
    * join as user_id·10⁶ + session_id and is decomposed back on output;
    * the 1e6 envelope is ENFORCED per row (`raise_error`, map-side, no
    * extra pass) — a user with ≥1e6 sessions fails the job loudly
    * instead of silently corrupting (user_id, session_id) on decode.
    */
  def sessionsDuringBursts(events: DataFrame, burstType: String = "error",
      burstGapMs: Long = 600000L, gridMs: Long = 3600000L): DataFrame = {
    val bursts = globalBursts(events, burstType, burstGapMs)
      .select(col("burst_id").as("a_id"), col("lo").as("a_lo"), col("hi").as("a_hi"))
    val guardedSession = when(col("session_id") < 1000000L, col("session_id"))
      .otherwise(raise_error(concat(
        lit("sessionsDuringBursts: session_id overflows the 1e6 pack envelope for user "),
        col("user_id").cast("string"))))
    val sessions = sessionize(events)
      .select((col("user_id") * 1000000L + guardedSession).as("b_id"),
        col("session_start_ms").as("b_lo"), col("session_end_ms").as("b_hi"))
    intervalOverlapJoin(bursts, sessions, gridMs)
      .select(col("a_id").as("burst_id"),
        expr("b_id div 1000000L").as("user_id"),
        expr("b_id % 1000000L").as("session_id"),
        col("overlap_ms"))
  }

  /** Tumbling daily window per event type — the batch form of
    * `groupBy(window($"ts", "1 day"), $"event_type")`.
    */
  def tumblingDaily(events: DataFrame): DataFrame =
    events.groupBy(
        date_format(col("ts_utc"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal-exact sum; final cast to double so pyarrow and DuckDB
        // surface the same float64 to the driver's hash (see Queries.outDouble)
        sum(dec6(col("value"))).cast("decimal(38,6)").cast("double").as("sum_value"))

  /** Time-series gap fill: regularize the per-type hourly series onto a
    * dense grid — missing hours get count 0 and a last-observation-
    * carried-forward (LOCF) value sum. The densification primitive every
    * downstream resampler/forecaster assumes (and Spark has no native
    * GAP FILL operator — this is the compose-built-ins form: per-key
    * span agg → `sequence` explode → left join → `last(ignoreNulls)`).
    *
    * Scale shape: the hourly agg shuffles only (hour × type) groups
    * (map-side partials); the grid is |types| × span rows — output-
    * sized, generated from a |types|-row span table, never from the
    * event data. The LOCF window partitions by type over grid rows.
    * The grid starts at each type's first observed hour, so LOCF is
    * never null. Value sums stay decimal-exact until the final double
    * cast (see tumblingDaily).
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts_utc")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec6(col("value"))).cast("decimal(38,6)").as("sv"))
    val span = hourly.groupBy("event_type")
      .agg(min("hour").as("lo"), max("hour").as("hi"))
    val grid = span.select(col("event_type"),
      explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sv"), ignoreNulls = true).over(w)
          .cast("double").as("value_locf"))
  }

  /** Simple two-step funnel: users who did `from` then later `to`. */
  def funnel(events: DataFrame, from: String, to: String): DataFrame = {
    val a = events.filter(col("event_type") === from)
      .groupBy("user_id").agg(min("ts_us").as("first_from"))
    val b = events.filter(col("event_type") === to)
      .groupBy("user_id").agg(max("ts_us").as("last_to"))
    a.join(b, Seq("user_id"))
      .filter(col("last_to") > col("first_from"))
      .select(col("user_id"))
  }

  /** Lead/lag neighborhood: each event with its user's previous and next
    * event types — the per-key sequence-context primitive (one shuffle on
    * user_id, same partitioning every other per-user operator uses).
    */
  def eventNeighborhood(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("event_type"),
      lag("event_type", 1).over(w).as("prev_type"),
      lead("event_type", 1).over(w).as("next_type"))
  }

  /** As-of join (time-series point lookup): for every `leftType` event,
    * the user's latest `rightType` event with ts ≤ the left event's ts
    * (inclusive), or null if none. Spark lacks a native as-of join;
    * composed Spark-first as union + last_value-ignore-nulls over one
    * user-partitioned window — a single shuffle on user_id, no range
    * self-join blowup (SURVEY.md §7.3 preference (a): compose built-ins).
    *
    * Tie discipline: right rows sort before left rows at equal ts_us
    * (inclusive as-of), ties among right rows break by event_id.
    */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("ts_ms"),
        lit(null).cast("long").as("r_event_id"),
        lit(null).cast("long").as("r_ts_ms"),
        lit(1).as("is_left"))
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("ts_ms"),
        col("event_id").as("r_event_id"),
        col("ts_ms").as("r_ts_ms"),
        lit(0).as("is_left"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_event_id", last("r_event_id", ignoreNulls = true).over(w))
      .withColumn("asof_ts_ms", last("r_ts_ms", ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("asof_event_id"), col("asof_ts_ms"))
  }

  /** JSON payload extraction: the `props` column is a JSON string (the
    * envelope `detail` pattern, P7) — pull a typed field without parsing
    * the document twice. get_json_object is codegen'd path extraction.
    */
  def jsonKSum(events: DataFrame): DataFrame =
    events
      // try_cast, not cast: props is free-form JSON, and under ANSI one
      // event with a non-numeric $.k would kill the whole aggregate —
      // unparseable values become NULL and drop out of the sum
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("long"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  /** Pivot: per-user event-type counts as columns. The value list is
    * declared (not discovered), so the plan is a single groupBy — no
    * extra distinct-values job at scale.
    */
  def pivotCounts(events: DataFrame, types: Seq[String]): DataFrame =
    events.groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)

  /** Range join, bucketized: all events of the same user within
    * (0, windowSec] seconds AFTER each `anchorType` event. The naive form
    * is an inequality join (quadratic blowup); here each side buckets its
    * timestamp into windowSec-wide buckets and joins on (user, bucket)
    * and (user, bucket+1) — equality keys, shuffled-hash at any scale —
    * then filters the exact interval. Standard time-bucketed range join.
    */
  def rangeJoinAfter(events: DataFrame, anchorType: String, windowSec: Int): DataFrame = {
    val wUs = windowSec * 1000000L
    val anchors = events.filter(col("event_type") === anchorType)
      .select(col("user_id"), col("event_id").as("anchor_event_id"),
        col("ts_us").as("anchor_ts_us"))
      .withColumn("bucket", explode(array(
        expr(s"anchor_ts_us div $wUs"), expr(s"anchor_ts_us div $wUs + 1"))))
      .repartition(events.sparkSession.sparkContext.defaultParallelism)
    val others = events
      .select(col("user_id"), col("event_id").as("other_event_id"),
        col("event_type").as("other_type"), col("ts_us").as("other_ts_us"))
      .withColumn("bucket", expr(s"other_ts_us div $wUs"))
    anchors.join(others, Seq("user_id", "bucket"))
      .filter(col("other_ts_us") > col("anchor_ts_us")
        && col("other_ts_us") <= col("anchor_ts_us") + wUs)
      .select(col("user_id"), col("anchor_event_id"), col("other_event_id"),
        col("other_type"),
        (col("other_ts_us") - col("anchor_ts_us")).as("dt_us"))
    // no dedup needed: the two anchor bucket replicas have distinct bucket
    // values and each other-row has exactly one bucket -> at most one match
  }

  /** Retention cohorts — the classic activation metric: users grouped by
    * their first-seen day; for each cohort and each day-offset d, how
    * many of them were active d days later. Two shuffles, both on
    * user_id (first-seen aggregate, then the distinct active-day set);
    * the final (cohort, d) aggregate carries one row per user-day.
    */
  def retentionCohorts(events: DataFrame, maxDays: Int = 7): DataFrame = {
    val day = expr("ts_us div 86400000000")
    val firstDay = events.groupBy("user_id").agg(min(day).as("cohort_day"))
    val activeDays = events.select(col("user_id"), day.as("day")).distinct()
    activeDays.join(firstDay, "user_id")
      .withColumn("d", col("day") - col("cohort_day"))
      .filter(col("d") <= maxDays)
      .groupBy("cohort_day", "d")
      // plain count, provably equal to countDistinct here: (user_id, day)
      // is distinct and each user has ONE cohort_day, so within a
      // (cohort_day, d) group day is fixed and a user contributes at most
      // one row — and count gets map-side partial aggregation where
      // countDistinct plans a two-phase expand
      .agg(count(lit(1)).as("n_users"))
  }

  /** Fixed-width value histogram per event type — distribution profiling
    * in one map-side bin projection + one aggregate. floor(v/width) is
    * exact IEEE (one division, one floor), so bins are engine-identical.
    */
  def valueHistogram(events: DataFrame, binWidth: Double = 10.0): DataFrame =
    events
      .groupBy(col("event_type"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Oracle-friendly numeric discipline (shared by all query modules):
    * SUMS over doubles differ between engines in the last bits (parallel
    * summation order), so cast each summand to decimal BEFORE aggregating —
    * decimal arithmetic is exact and engine-independent. Small-magnitude
    * derived doubles (ratios, cosines) are safe to cast once at the end.
    */
  def dec6(c: Column): Column = c.cast("decimal(18,6)")
}
