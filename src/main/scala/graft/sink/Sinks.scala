package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Sinks (SURVEY.md §2.4, K1-K3).
  *
  * K1 — the reference's terminal sink is a DynamoDB PutItem keyed by `id`
  * (load.ts:61-78; stack.ts:32-35): a full-item overwrite, i.e.
  * last-write-wins upsert. That idempotence is what absorbs the pipeline's
  * at-least-once redelivery (SURVEY.md §1.4).
  *
  * K3 — the observe rule taps every event on the bus into an audit log
  * (observe.ts:4-6; stack.ts:276-283).
  */
object KeyedUpsertSink {

  /** Last-write-wins compaction: keep exactly one row per key, the one
    * ranked first by `order` descending (ties broken by the later columns).
    * This is the set-semantics of N PutItem calls against a keyed table.
    *
    * Scale note: one shuffle on the key — the same partitioning a keyed
    * store would impose. Skewed keys are handled by AQE skew-join/agg
    * splitting; no driver-side state.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Attribute names an order spec references — the columns every batch
    * must carry for the LWW rank to be meaningful. Collected from the
    * FULLY-CONVERTED catalyst tree (Spark 4 Columns are ColumnNode-based;
    * the lazy `ExpressionUtils.expression` wrapper hides children from
    * `collect`, so go through the session converter —
    * [[org.apache.spark.sql.graft.Bridge.convertedExpression]]), so
    * composite orders (`col("a") + col("b")`) contribute every referenced
    * attribute. Covers both unresolved references (`col("ts")`) and
    * already-resolved ones (`df("ts")` yields an AttributeReference).
    */
  private def orderColNames(spark: SparkSession, order: Seq[Column]): Seq[String] =
    order.flatMap(c =>
      org.apache.spark.sql.graft.Bridge.convertedExpression(spark, c).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          // HEAD, not last: `col("payload.ts")` demands the TOP-LEVEL
          // column `payload` of the batch — demanding `ts` would both
          // reject valid batches and readmit the silent null-filled-
          // struct loss on batches that carry a stray top-level `ts`
          a.nameParts.head
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.name
      }).distinct

  /** Schema-evolution is for VALUE columns only: a batch missing a KEY
    * column would null-fill it and collapse every batch row into one
    * null-key group (silent data loss), and a batch missing an ORDER
    * column would null-fill it and — under desc, nulls-last — silently
    * lose every LWW comparison (a stale no-op upsert). Fail loudly
    * instead, before `unionByName(allowMissingColumns = true)` can paper
    * over it.
    */
  private def requireKeyOrderCols(batch: DataFrame, keys: Seq[String],
      order: Seq[Column]): Unit = {
    // match names the way unionByName will: with the session's resolver,
    // so under spark.sql.caseSensitive=true a batch carrying `TS` does
    // NOT satisfy a guard for `ts` (unionByName would null-fill `ts`)
    val resolver = batch.sparkSession.sessionState.conf.resolver
    val have = batch.columns.toSeq
    val missing = (keys ++ orderColNames(batch.sparkSession, order))
      .filterNot(c => have.exists(resolver(_, c)))
    require(missing.isEmpty,
      s"batch is missing key/order column(s) ${missing.mkString(", ")} " +
        s"(batch columns: ${batch.columns.mkString(", ")}) — schema " +
        "evolution null-fills VALUE columns only; a null-filled key or " +
        "order column silently corrupts the LWW merge")
  }

  /** New batch outranks existing rows on equal order values: tag a
    * generation column so replays/redeliveries resolve deterministically.
    * THE LWW merge shared by every upsert variant — one place for the
    * tie-break semantics.
    *
    * Schemas align BY NAME with null back-fill in both directions, so a
    * batch that ADDS a column merges against older rows (which get null
    * there). Key and order columns must exist in every batch
    * ([[requireKeyOrderCols]] fails loudly otherwise); on the VERSIONED
    * committers a batch dropping or retyping a committed value column
    * is refused before reaching here ([[evolveSchemaMeta]] — the
    * deliberate contract), while the metadata-less lock-path sinks keep
    * the legacy permissive union (a lacked column survives as null on
    * the new rows).
    */
  private def mergeLww(existing: Option[DataFrame], batch: DataFrame,
      keys: Seq[String], order: Seq[Column]): DataFrame = {
    // single source of truth for the guard: EVERY public entry point
    // ([[upsertBatch]] and the four bucketed sinks) runs
    // [[requireKeyOrderCols]] before reaching here — re-validating per
    // merge would re-run on every optimistic restage for nothing
    val tagged = batch.withColumn("__gen", lit(1L))
    val merged = existing match {
      case Some(old) =>
        latestByKey(
          old.withColumn("__gen", lit(0L))
            .unionByName(tagged, allowMissingColumns = true),
          keys, order :+ col("__gen"))
      case None => latestByKey(tagged, keys, order)
    }
    merged.drop("__gen")
  }

  /** Streaming upsert via foreachBatch: read-merge-overwrite a parquet
    * table (build environment has no transactional table format on the
    * classpath — SURVEY.md §7.4.4; on a real deployment this body swaps for
    * a Delta/Iceberg MERGE keyed on `keys`).
    *
    * Idempotent per batch replay: merging the same batch twice is a no-op
    * because the merge itself is last-write-wins on `keys` — this upgrades
    * the reference's at-least-once to effectively-once. Crash windows:
    * the replace is a rename-aside + rename-in swap (microseconds, never
    * an O(files) delete with the table absent), and a crash between the
    * two renames self-heals on the next batch ([[recoverReplace]] moves
    * the set-aside table back). For multi-writer / reader-concurrent
    * crash-consistency use [[upsertBucketedAtomic]] — manifest readers
    * never observe a partial swap there.
    */
  def upsertBatch(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column])(batch: DataFrame, batchId: Long): Unit = {
    requireKeyOrderCols(batch, keys, order)
    val target = Paths.get(tablePath)
    recoverReplace(target)
    reclaimReplaceLeftovers(target)
    // empty batch: merging is the identity — and writing would create a
    // _SUCCESS-only directory that poisons the next batch's schema read
    if (batch.isEmpty) return
    val existing =
      if (nonEmptyDir(target)) Some(spark.read.parquet(tablePath))
      else None
    val staging = tablePath + s".staging-$batchId"
    mergeLww(existing, batch, keys, order)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    replaceDir(Paths.get(staging), target)
  }

  /** Existence probe that closes its directory stream — a bare
    * `Files.list(...).findAny()` leaks one descriptor per micro-batch on
    * a long-running stream. A directory holding only the `_SUCCESS`
    * marker or hidden staging entries counts as EMPTY — reading one as a
    * table fails schema inference. `__bucket=N` partition directories DO
    * count (they start with `_` but are the data itself).
    */
  private[graft] def nonEmptyDir(target: Path): Boolean =
    Files.exists(target) && {
      import scala.jdk.CollectionConverters._
      val s = Files.list(target)
      try s.iterator().asScala.exists { p =>
        val n = p.getFileName.toString
        // metadata sidecars are not data: a table holding only _SUCCESS
        // or _layout (written by ensureLayout BEFORE the first data
        // lands) must still read as empty
        n != "_SUCCESS" && n != "_layout" && !n.startsWith(".")
      } finally s.close()
    }

  /** Swap `staging` into place with two renames: the old table moves
    * aside (one rename — never a recursive delete while the table is
    * absent), staging moves in, and only then is the set-aside copy
    * reclaimed. The crash window is two metadata operations; a crash
    * inside it leaves the old table intact under `.old-*`, which
    * [[recoverReplace]] restores on the next batch instead of silently
    * rebuilding the table from one batch.
    */
  private def replaceDir(staging: Path, target: Path): Unit = {
    if (Files.exists(target)) {
      // wall-clock stamp, NOT nanoTime: recoverReplace picks the newest
      // set-aside numerically, and nanoTime origins are arbitrary per JVM
      // — across a restart it could rank a stale crash leftover above the
      // genuinely newest table
      val old = Paths.get(s"$target.old-${System.currentTimeMillis()}")
      Files.move(target, old)
      Files.move(staging, target)
      deleteRecursively(old)
    } else Files.move(staging, target)
  }

  /** Crash recovery for [[replaceDir]]: if the table is missing but a
    * set-aside `.old-*` sibling exists (crash between the two renames),
    * restore the newest one — the previously committed table — before
    * merging anything.
    */
  private def recoverReplace(target: Path): Unit = {
    if (Files.exists(target)) return
    val stamp = target.getFileName.toString + ".old-"
    // numeric sort on the wall-clock suffix — a lexicographic sort
    // mis-orders across digit-count boundaries
    siblings(target, ".old-")
      .sortBy(p => p.getFileName.toString.stripPrefix(stamp).toLongOption
        .getOrElse(Long.MinValue))
      .lastOption.foreach(old => Files.move(old, target))
  }

  /** Best-effort reclamation of crash leftovers around a replaced table:
    * with the table present, any `.old-*` / `.staging-*` sibling older
    * than a one-minute grace is an abandoned attempt (the same dwell
    * rule as the atomic variant's `_manifest.tmp-*` sweep).
    */
  private def reclaimReplaceLeftovers(target: Path): Unit = {
    if (!Files.exists(target)) return
    val now = System.currentTimeMillis()
    (siblings(target, ".old-") ++ siblings(target, ".staging-"))
      .filter(p => now - Files.getLastModifiedTime(p).toMillis > 60000L)
      .foreach(deleteRecursively)
  }

  /** Siblings of `target` named `<table><suffixPrefix>*`. */
  private def siblings(target: Path, suffixPrefix: String): Seq[Path] = {
    val parent = target.getParent
    if (parent == null || !Files.exists(parent)) return Seq.empty
    val prefix = target.getFileName.toString + suffixPrefix
    import scala.jdk.CollectionConverters._
    val s = Files.list(parent)
    try s.iterator().asScala.toList
      .filter(_.getFileName.toString.startsWith(prefix))
    finally s.close()
  }

  /** Recursive delete that closes its walk stream — same descriptor-leak
    * class as the `Files.list` fixed in [[nonEmptyDir]]; invoked per
    * micro-batch on replace/vacuum paths.
    */
  private[sink] def deleteRecursively(root: Path): Unit = {
    val s = Files.walk(root)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally s.close()
  }

  /** Hash-bucket partition of the key tuple — the physical layout key for
    * [[upsertBucketed]]. An internal layout detail (never an output
    * value), so the engine-native xxhash64 is fine here.
    */
  def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong))

  /** The `_layout` sidecar: the bucket count is part of the TABLE's
    * identity, not the writer's configuration — a writer hashing into 8
    * buckets against a table laid out in 16 scatters each key across
    * two bucket functions, and the LWW merge (which reads only the
    * buckets ITS hash says the keys live in) silently resurrects stale
    * rows. Recorded once at first commit via [[putIfAbsent]] (two
    * first-committers race safely: the loser validates against the
    * winner's value) and validated by every subsequent writer and by
    * [[lookupBucketed]]. Underscore prefix keeps it invisible to
    * parquet directory scans.
    */
  private def layoutPath(tablePath: String): Path =
    Paths.get(tablePath, "_layout")

  private[graft] def readLayout(tablePath: String): Option[Int] = {
    val p = layoutPath(tablePath)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.stripPrefix("numBuckets=").toInt)
  }

  /** The table's CURRENT bucket count: the head manifest's `#numBuckets`
    * metadata when a [[rebucketTable]] has run (authoritative — the
    * sidecar is frozen at first commit and goes stale at the first
    * resize), else the `_layout` sidecar.
    */
  private[graft] def effectiveNumBuckets(tablePath: String): Option[Int] =
    versionedHeadFull(tablePath)._3.get("numBuckets").map(_.toInt)
      .orElse(readLayout(tablePath))

  /** Retry-loop guard for writers: a [[rebucketTable]] that committed
    * since this writer staged means its batch is hashed with a DEAD
    * layout — re-staging would scatter keys across two bucket functions.
    * Fail the batch loudly; the caller replays it with the new count.
    */
  private def requireLayoutUnchanged(tablePath: String, numBuckets: Int,
      headMeta: Map[String, String]): Unit =
    headMeta.get("numBuckets").map(_.toInt).foreach { nb =>
      if (nb != numBuckets) throw new IllegalStateException(
        s"$tablePath was re-bucketed to numBuckets=$nb while this writer " +
          s"(numBuckets=$numBuckets) had a batch in flight — the staged " +
          "generation is hashed with the old layout; replay the batch " +
          "with the new bucket count (idempotent under the LWW merge)")
    }

  private def ensureLayout(tablePath: String, numBuckets: Int): Unit = {
    def check(recorded: Int): Unit = require(recorded == numBuckets,
      s"$tablePath is laid out with numBuckets=$recorded but this writer " +
        s"was configured with numBuckets=$numBuckets — a mixed bucket " +
        "function scatters keys across two layouts and silently breaks " +
        s"the LWW merge; use $recorded (or rebucketTable to resize)")
    effectiveNumBuckets(tablePath) match {
      case Some(nb) => check(nb)
      case None =>
        // adopting on a PRE-EXISTING (pre-sidecar) table: the adopted
        // count can only be validated against on-disk evidence — any
        // bucket id >= numBuckets proves this writer's layout wrong
        // before it corrupts anything. (The residual risk — a legacy
        // table whose populated ids happen to all fall below a too-small
        // numBuckets — would need a data re-hash to catch; tables
        // created after the sidecar existed never face it.)
        val existing = readManifest(tablePath).keySet ++
          diskBucketIds(Paths.get(tablePath))
        existing.find(_ >= numBuckets).foreach { b =>
          throw new IllegalArgumentException(
            s"$tablePath holds bucket id $b but this writer is configured " +
              s"with numBuckets=$numBuckets — the table predates the " +
              "_layout sidecar and was laid out with a larger bucket " +
              "count; configure the original numBuckets to adopt it")
        }
        Files.createDirectories(Paths.get(tablePath))
        putIfAbsent(layoutPath(tablePath),
          s"numBuckets=$numBuckets\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // lost race → another first-committer published; validate theirs
        check(readLayout(tablePath).get)
    }
  }

  /** Top-level `__bucket=N` partition ids of the PLAIN bucketed layout
    * (the manifest variants nest them under `gen-*`; those ids come from
    * [[readManifest]] instead). Adoption-time evidence only.
    */
  private def diskBucketIds(dir: Path): Set[Long] = {
    if (!Files.exists(dir)) return Set.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith("__bucket=")) n.stripPrefix("__bucket=").toLongOption
      else None
    }.toSet finally s.close()
  }

  /** Bucketed streaming upsert: the table lives as `__bucket=N/` hash
    * partitions of the key, and each micro-batch rewrites ONLY the
    * buckets it touches (dynamic partition overwrite) — per-trigger cost
    * is O(touched buckets), not O(table). This is the no-Delta answer to
    * the flat [[upsertBatch]]'s known non-scale rewrite: with buckets
    * sized so each holds ~one output-file of keys, a key-local batch
    * rewrites a handful of directories while a 100 TB table stands still.
    * (A transactional format would still be the production choice — this
    * keeps the same layout discipline a bucketed MERGE relies on.)
    *
    * Same LWW/generation semantics as [[upsertBatch]]; replays merge to
    * a no-op. Point lookups prune to one bucket directory
    * ([[readBucketed]] + a `__bucket = bucketOf(...)` filter).
    */
  def upsertBucketed(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit = {
    // pin the batch before deriving `touched`: the write re-executes the
    // plan, and a non-deterministic upstream could otherwise emit a row
    // into a bucket absent from `touched` — dynamic overwrite would then
    // replace that bucket WITHOUT its merged old rows (silent deletion).
    // The persist closes this in single-JVM mode (blocks cannot be lost);
    // on a cluster an executor loss can still force a recompute, which is
    // why [[upsertBucketedAtomic]] — whose post-write disk listing
    // fail-louds on any unmerged bucket — is the multi-executor
    // deployment path.
    // guard BEFORE bucketing: a batch missing a KEY column must surface
    // as the contract message, not as bucketOf's unresolved-column error
    requireKeyOrderCols(batch, keys, order)
    val bucketed = batch
      .withColumn("__bucket", bucketOf(keys, numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // distinct buckets of a micro-batch: a bounded-size (≤ numBuckets)
      // driver list — partition-pruning metadata, not data
      val touched = bucketed.select("__bucket").distinct()
        .collect().map(_.getLong(0))
      // empty batch: nothing to merge, and writing would leave a
      // marker-only directory behind
      if (touched.isEmpty) return
      ensureLayout(tablePath, numBuckets)
      val target = Paths.get(tablePath)
      // mergeSchema: a widened batch leaves touched buckets on the new
      // schema while untouched buckets keep the old one — without the
      // union the read would pin whichever file's schema it sampled.
      // (The atomic/optimistic variants get evolution from per-generation
      // scans instead, without the per-file footer cost at scale.)
      val existing =
        if (!nonEmptyDir(target)) None
        else Some(spark.read.option("mergeSchema", "true").parquet(tablePath)
          .filter(col("__bucket").isin(touched: _*))) // prunes to touched dirs
      mergeLww(existing, bucketed, keys, order)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic") // replace touched buckets only
        .partitionBy("__bucket")
        .parquet(tablePath)
    } finally bucketed.unpersist()
  }

  /** Read the bucketed table without its layout column (mergeSchema so
    * partially-evolved bucket directories read as the by-name union).
    */
  def readBucketed(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath).drop("__bucket")

  // ─────────────────────────── atomic generation-manifest variant ──

  /** Atomic bucketed upsert: [[upsertBucketed]]'s dynamic partition
    * overwrite rewrites touched bucket directories IN PLACE, so a writer
    * dying mid-batch leaves some buckets new and some old — a torn
    * table. This variant writes each batch's merged buckets under a
    * fresh `gen-<batchId>/` directory and then atomically swaps a
    * manifest file mapping every bucket to the generation holding its
    * current version (one POSIX rename — the same generation-pointer
    * discipline a transactional table format uses, minus the format).
    * A crash anywhere before the rename leaves the manifest untouched:
    * readers keep resolving the previous consistent generation set, and
    * the orphaned gen directory is garbage, not corruption (reclaimed by
    * [[vacuumGenerations]]).
    *
    * Same LWW/generation-column merge and O(touched buckets)/trigger
    * cost as [[upsertBucketed]]: the merge reads only the touched
    * buckets' current directories (resolved via the manifest), and the
    * batch replays to a no-op on redelivery.
    */
  def upsertBucketedAtomic(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit =
    // the lock spans merge AND commit — see withTableLock for why a
    // commit-only lock still loses rows under concurrent writers
    withTableLock(tablePath) {
      writeGeneration(spark, tablePath, keys, order, numBuckets, batch, batchId) match {
        case Some((gen, touched)) => commitManifestLocked(tablePath, touched, gen)
        case None => () // empty batch: nothing staged, nothing to commit
      }
    }

  /** Stage step: merge the batch against the touched buckets' current
    * versions and write the result under a FRESH per-attempt generation
    * directory — NOT yet visible to readers. Returns the generation name
    * and the bucket ids actually written for [[commitManifest]]; None for
    * an empty batch. Public so the crash-recovery spec can stage without
    * committing (simulating a writer killed between the bucket writes and
    * the manifest swap).
    *
    * Two redelivery hazards are closed here:
    *  - every attempt stages under its own directory ([[nextGenName]]):
    *    replaying an already-committed batchId must never overwrite the
    *    generation the manifest (and the merge plan's lazy read) still
    *    points at — that overwrite deletes files mid-plan and tears the
    *    table. With unique attempt dirs the replay merges old-vs-new to a
    *    LWW no-op into a new generation and the superseded one becomes
    *    vacuumable garbage, never corruption.
    *  - the batch is pinned (persist + the `touched` action) before the
    *    merge, and the committed bucket list is derived by LISTING the
    *    generation directory after the write — the manifest can only ever
    *    reference `__bucket=N` directories that exist on disk, even if
    *    the upstream batch expression is non-deterministic.
    */
  def writeGeneration(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int,
      batch: DataFrame,
      batchId: Long): Option[(String, Seq[Long])] = {
    // guard BEFORE bucketing: a batch missing a KEY column must surface
    // as the contract message, not as bucketOf's unresolved-column error
    requireKeyOrderCols(batch, keys, order)
    val bucketed = batch
      .withColumn("__bucket", bucketOf(keys, numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // distinct buckets of a micro-batch: bounded (≤ numBuckets) metadata
      val touched = bucketed.select("__bucket").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
      if (touched.isEmpty) return None
      ensureLayout(tablePath, numBuckets)
      val manifest = readManifest(tablePath)
      Some(stageAgainst(spark, tablePath, keys, order, bucketed, touched,
        nextGenName(tablePath, batchId),
        manifest.filter { case (b, _) => touched.contains(b) }))
    } finally bucketed.unpersist()
  }

  /** Merge the (already bucketed + pinned) batch against an EXPLICIT
    * bucket→generation base and write the result under the given fresh
    * attempt directory. The shared staging core of the lock path
    * ([[writeGeneration]] passes the current manifest) and the
    * optimistic path ([[upsertBucketedOptimistic]] passes the version
    * it will later validate at commit time). Returns (gen, bucket ids
    * actually written).
    */
  private def stageAgainst(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      bucketed: DataFrame,
      touched: Seq[Long],
      gen: String,
      base: Map[Long, String]): (String, Seq[Long]) = {
    // a base bucket may carry a delta CHAIN (mixed-mode table: delta
    // commits landed since the last merge-on-write) — resolve it first,
    // so this merge doubles as that bucket's compaction
    val existing = readManifestBuckets(spark, tablePath, base)
      .map(resolveChainRead(_, base, keys, order))
    mergeLww(existing, bucketed, keys, order)
      .write.mode(SaveMode.ErrorIfExists) // attempt dirs are never reused
      .partitionBy("__bucket")
      .parquet(s"$tablePath/$gen")
    val written = listBucketIds(Paths.get(tablePath, gen))
    // the write RE-EXECUTES the batch plan; if the persist's blocks
    // were lost (executor failure) a non-deterministic batch can
    // recompute rows into a bucket absent from `touched` — whose old
    // rows were then never merged. Committing that generation would
    // silently drop them, so fail the attempt loudly instead: attempt
    // dirs are write-once and vacuum-reclaimed, and the replay
    // re-merges from scratch.
    require(written.forall(touched.contains),
      s"batch recompute emitted unmerged buckets " +
        s"${written.filterNot(touched.contains).mkString(",")} " +
        s"(non-deterministic batch after lost persist blocks); " +
        s"attempt $gen abandoned, replay will re-merge")
    (gen, written)
  }

  /** First attempt of a batch stages under `gen-<batchId>`; each replay
    * under `gen-<batchId>-r<k>` for the first free k. Attempt dirs are
    * write-once, so a stage never deletes data a live plan or manifest
    * still references.
    */
  private def nextGenName(tablePath: String, batchId: Long): String = {
    val base = s"gen-$batchId"
    if (!Files.exists(Paths.get(tablePath, base))) base
    else {
      var k = 1
      while (Files.exists(Paths.get(tablePath, s"$base-r$k"))) k += 1
      s"$base-r$k"
    }
  }

  /** Bucket ids present on disk under a generation directory. */
  private def listBucketIds(genDir: Path): Seq[Long] = {
    val s = Files.list(genDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("__bucket="))
        .map(_.stripPrefix("__bucket=").toLong)
        .toSeq.sorted
    } finally s.close()
  }

  /** Commit step: point the touched buckets at `gen` via write-tmp +
    * fsync + atomic rename. THE visibility boundary — everything before
    * this is invisible to readers. Also snapshots the committed manifest
    * under `_hist/<gen>` so [[vacuumGenerations]] can grant stalled
    * readers a grace window of prior manifests.
    */
  /** Per-table JVM monitors backing [[withTableLock]] (the OS file lock
    * below throws OverlappingFileLockException for two threads of ONE
    * process, so in-process callers serialize here first).
    */
  private val manifestMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-table writer serialization: JVM monitor + OS file lock
    * (local/NFS cross-process). [[upsertBucketedAtomic]] holds it across
    * the WHOLE read-merge-stage-commit: locking only the manifest update
    * would still let a concurrent writer MERGE against a manifest
    * snapshot that misses the other's commit to a shared bucket — lost
    * rows with a perfectly consistent-looking manifest. Writers to
    * DIFFERENT tables stay fully parallel. This lock is the
    * single-host/local-FS fast path: on object stores (no file locks,
    * racing DRIVERS) use [[upsertBucketedOptimistic]], whose versioned
    * put-if-absent commit needs no lock at all.
    */
  private def withTableLock[A](tablePath: String)(body: => A): A =
    manifestMonitors.computeIfAbsent(tablePath, _ => new Object).synchronized {
      Files.createDirectories(Paths.get(tablePath))
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(tablePath, "_manifest.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }

  def commitManifest(tablePath: String, touched: Seq[Long], gen: String): Unit =
    withTableLock(tablePath)(commitManifestLocked(tablePath, touched, gen))

  private def commitManifestLocked(tablePath: String, touched: Seq[Long],
      gen: String): Unit = {
    // protocol one-way valve: once a versioned chain exists the table
    // belongs to the optimistic sink — a lock-path commit would write the
    // legacy `_manifest`, which every reader now ignores in favor of the
    // chain head, silently unpublishing this commit. This check is
    // race-free, not check-then-act: it runs under withTableLock, and the
    // only commit that can CREATE the chain concurrently (the optimistic
    // v0→v1 migration publish) takes the same lock
    require(versionFiles(Paths.get(tablePath)).isEmpty,
      s"$tablePath has a versioned manifest chain (optimistic protocol); " +
        "use upsertBucketedOptimistic — the lock-path commit would be invisible")
    val next = readManifest(tablePath) ++ touched.map(_ -> gen)
    val bytes = renderManifest(next)
    val tmp = Paths.get(tablePath, s"_manifest.tmp-$gen")
    writeFsynced(tmp, bytes)
    Files.move(tmp, Paths.get(tablePath, "_manifest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    fsyncDir(Paths.get(tablePath)) // make the rename itself durable
    val hist = Paths.get(tablePath, "_hist")
    Files.createDirectories(hist)
    // same tmp + atomic-rename discipline as _manifest: an in-place
    // write crashed (or read) halfway leaves a truncated snapshot that
    // poisons every later vacuumGenerations(grace>0) parse
    val histTmp = hist.resolve(s".$gen.tmp")
    writeFsynced(histTmp, bytes)
    Files.move(histTmp, hist.resolve(gen),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // ─────────────────── optimistic (object-store-safe) commit variant ──

  /** Result of one [[upsertBucketedOptimistic]] batch: the committed
    * manifest version, the generation holding the batch's buckets, how
    * many commit attempts lost the put-if-absent race to a DISJOINT
    * writer (retried with no re-merge), and how many times an
    * OVERLAPPING writer forced a full re-merge.
    */
  case class OptimisticCommit(version: Long, gen: String,
      commitRetries: Int, restages: Int)

  /** Manifest chain head: (version, bucket→gen map). Version 0 = no
    * versioned commit yet; its map is the legacy `_manifest` when one
    * exists (so a lock-path table upgrades in place: the first
    * optimistic commit writes `_manifest.v1` carrying the legacy
    * entries forward) and empty otherwise.
    */
  private[graft] def versionedHead(tablePath: String): (Long, Map[Long, String]) = {
    val (v, m, _) = versionedHeadFull(tablePath)
    (v, m)
  }

  /** Chain head including its metadata (the legacy v0 state has none —
    * pre-meta formats resolve layout from the `_layout` sidecar). ONE
    * read of the head file feeds both parsers — this sits on every
    * commit attempt's critical path.
    */
  private[graft] def versionedHeadFull(
      tablePath: String): (Long, Map[Long, String], Map[String, String]) =
    versionFiles(Paths.get(tablePath)).maxByOption(_._1) match {
      case Some((v, p)) =>
        import scala.jdk.CollectionConverters._
        val lines = Files.readAllLines(p).asScala.toSeq
        (v, parseManifestLines(lines), parseMetaLines(lines))
      case None => (0L, legacyManifest(tablePath), Map.empty)
    }

  /** All committed `_manifest.v*` files as (version, path). Published
    * atomically ([[putIfAbsent]]), so every listed file is complete.
    */
  private def versionFiles(dir: Path): Seq[(Long, Path)] = {
    if (!Files.exists(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.toList.flatMap { p =>
      val n = p.getFileName.toString
      if (!n.startsWith("_manifest.v")) None
      else n.stripPrefix("_manifest.v").toLongOption.map(_ -> p)
    } finally s.close()
  }

  /** Zero-padded so a plain lexicographic object-store listing orders
    * versions numerically.
    */
  private def versionPath(tablePath: String, version: Long): Path =
    Paths.get(tablePath, f"_manifest.v$version%020d")

  private def renderManifest(entries: Map[Long, String],
      meta: Map[String, String] = Map.empty): Array[Byte] =
    (meta.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" } ++
      entries.toSeq.sortBy(_._1).map { case (b, g) => s"$b,$g" })
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Atomic create-if-absent publish of a complete file — the ONE
    * primitive object stores give a multi-driver committer (S3
    * conditional PUT `If-None-Match: *`, GCS `ifGenerationMatch: 0`;
    * a real deployment swaps this body for that call). The local-FS
    * model is `link(2)`: write + fsync a hidden sibling, then hard-link
    * it to the target name — the link syscall atomically fails if the
    * name exists, with no TOCTOU window (unlike exists-then-move), and
    * the published name can never be observed part-written.
    */
  private[graft] def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = target.resolveSibling(
      s".${target.getFileName}.put-${java.util.UUID.randomUUID().toString.take(8)}")
    writeFsynced(tmp, bytes)
    try {
      Files.createLink(target, tmp)
      fsyncDir(target.getParent)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** One commit attempt: publish `entries` (+ metadata) as version
    * `version`. False = another writer took that version first (nothing
    * was published).
    */
  private[graft] def tryCommitVersion(tablePath: String, version: Long,
      entries: Map[Long, String],
      meta: Map[String, String] = Map.empty): Boolean =
    putIfAbsent(versionPath(tablePath, version), renderManifest(entries, meta))

  /** Outcome of one successor-publish attempt. Distinguishing the two
    * failure modes keeps caller diagnostics accurate: [[LostRace]] means
    * v(N+1) already exists (an ordinary optimistic loss — re-read the
    * head and retry), while [[BasePruned]] means base vN itself is gone
    * (vacuum pruned past this writer) and NOTHING was attempted — the
    * caller's stale-head `require` must not claim "v(N+1) exists" there.
    */
  private[graft] sealed trait Publish
  private[graft] case object Published extends Publish
  private[graft] case object LostRace extends Publish
  private[graft] case object BasePruned extends Publish

  /** One optimistic attempt to publish `entries` as the successor of
    * head `ver` (whose map at stage time was `manAtStage`). Shared by
    * every versioned committer (merge-on-write, delta append,
    * compaction).
    *
    * The v0→v1 transition is the ONE commit that can race a legacy
    * lock-path writer (its commit updates `_manifest`, which v1 must
    * carry forward in full). Check-then-publish without the lock has a
    * silent-unpublish window — legacy commits between the head read and
    * the v1 publish would vanish behind the chain head. Lock-path
    * writers hold this same lock for their whole commit, so under it
    * the legacy manifest is frozen: re-read it, bail as a lost race on
    * any drift. Steady state (ver >= 1) never comes here: legacy
    * writers are refused once a chain exists, so v2+ is lock-free (on a
    * real object store there are no legacy lock-path writers at all, so
    * the lock is a local-FS-only migration artifact).
    */
  private def publishNext(tablePath: String, ver: Long,
      manAtStage: Map[Long, String], entries: Map[Long, String],
      meta: Map[String, String] = Map.empty): Publish =
    if (ver == 0L) withTableLock(tablePath) {
      if (legacyManifest(tablePath) == manAtStage &&
        tryCommitVersion(tablePath, 1L, entries, meta)) Published else LostRace
    } else tryCommitSuccessor(tablePath, ver, entries, meta)

  /** Guarded successor publish for a versioned head (ver >= 1): refuses
    * to publish v(ver+1) when the base version file has been vacuum-
    * pruned. Without the guard, a writer stalled between reading head
    * vN and publishing v(N+1) for longer than the vacuum keep window
    * would putIfAbsent a PRUNED version number successfully — a commit
    * it reports as success but that readers (who resolve the max
    * version) never see: silent data loss. The pre-check converts that
    * stall into an ordinary lost race — the caller re-reads the
    * (necessarily newer) head and re-validates/re-stages. The
    * post-publish re-check closes the residual window (a vacuum pruning
    * the base BETWEEN the pre-check and the publish): visibility of the
    * just-published version can no longer be guaranteed, so fail the
    * batch loudly — the caller replays it, which at-least-once delivery
    * already demands — rather than report a success readers may never
    * observe. NOTE the throw fires AFTER v(ver+1) was durably published:
    * the message says so, and the replay is safe only because the LWW
    * merge is idempotent (replaying an already-visible batch is a no-op).
    *
    * `afterPrecheck` is a deterministic-interleaving seam for the spec
    * that pins the residual window (prod callers leave the no-op).
    */
  private[graft] def tryCommitSuccessor(tablePath: String, ver: Long,
      entries: Map[Long, String],
      meta: Map[String, String] = Map.empty,
      afterPrecheck: () => Unit = () => ()): Publish = {
    if (!Files.exists(versionPath(tablePath, ver))) return BasePruned
    afterPrecheck()
    val ok = tryCommitVersion(tablePath, ver + 1, entries, meta)
    if (ok && !Files.exists(versionPath(tablePath, ver)))
      throw new IllegalStateException(
        s"$tablePath: base _manifest.v$ver was vacuum-pruned inside the " +
          s"v${ver + 1} publish window — v${ver + 1} IS durably published " +
          "but its visibility to readers cannot be guaranteed; replay the " +
          "batch (idempotent under the LWW merge; vacuum retention must " +
          "exceed the writer's stage-commit span)")
    if (ok) Published else LostRace
  }

  /** Accurate stale-head diagnostic for a failed successor publish:
    * a [[BasePruned]] loss must not be described as "v(N+1) exists".
    */
  private def staleHeadMsg(tablePath: String, ver: Long, v2: Long,
      res: Publish): String = res match {
    case BasePruned =>
      s"$tablePath: base _manifest.v$ver was pruned beneath an in-flight " +
        s"writer (listed head: v$v2) — the version chain was vacuumed past " +
        "this writer (vacuum keep-window shorter than a stage-commit window)"
    case _ =>
      s"$tablePath: v${ver + 1} exists but the listed head is v$v2 — " +
        "the version chain was pruned past an in-flight writer " +
        "(vacuum keep-window shorter than a stage-commit window)"
  }

  /** Object-store-safe bucketed upsert: same LWW merge, bucket layout,
    * generation staging, and O(touched buckets)/trigger cost as
    * [[upsertBucketedAtomic]], but the commit is OPTIMISTIC CONCURRENCY
    * over a versioned manifest chain instead of a per-table lock —
    * `FileChannel.lock()` does not exist on S3/GCS, and at 100 TB two
    * DRIVERS (not threads) can race one table. Protocol:
    *
    *  1. read the chain head `vN` and stage the merge against the
    *     CURRENT versions of the touched buckets (fresh write-once
    *     attempt dir — invisible to readers);
    *  2. attempt to publish `_manifest.v(N+1)` with create-if-absent
    *     ([[putIfAbsent]] — the primitive object stores do give you);
    *  3. lost the race → re-read the head and detect conflict on
    *     TOUCHED-BUCKET OVERLAP: if none of this batch's buckets moved,
    *     the staged merge is still exact — re-attempt the commit on top
    *     of the new head with NO re-merge (disjoint writers of one
    *     table proceed in parallel, serialized only at the final
    *     put-if-absent); if a bucket moved, the staged merge is stale —
    *     re-merge against the new head and try again. Abandoned
    *     attempt dirs are garbage for [[vacuumGenerations]], never
    *     corruption.
    *
    * Liveness: some writer commits at every version number, so a batch
    * retries at most once per competing commit; `maxAttempts` bounds
    * TOTAL commit attempts — re-stages and disjoint-race retries alike —
    * so a writer starved by a hot-table storm surfaces as the exception
    * (the caller replays the batch — at-least-once delivery already
    * demands that) instead of spinning unboundedly.
    *
    * Steady-state writers (ver >= 1) serialize on NOTHING in-process: no
    * JVM monitor, no file lock (the racing-writers spec runs two threads
    * through this very path). The ONE exception is the v0→v1 migration
    * commit, which briefly takes the legacy table lock: it must carry
    * the legacy `_manifest` forward in full, and a lock-path writer can
    * update that file concurrently — publishing v1 under the same lock
    * those writers hold is what makes the upgrade valve race-free
    * rather than check-then-act (on a real object store there are no
    * legacy lock-path writers at all, so the lock is a local-FS-only
    * migration artifact). The lock-path [[upsertBucketedAtomic]] remains
    * the single-writer local-FS fast path; a table it wrote upgrades to
    * this protocol in place (legacy `_manifest` reads as version 0),
    * after which lock-path commits are refused.
    *
    * Schema evolution: a batch may ADD columns relative to earlier
    * generations (older rows read null there) — the merge and
    * [[readBucketedAtomic]] align by name across generations, and the
    * committed column contract widens atomically with the commit. A
    * batch DROPPING or RETYPING a committed column is refused loudly
    * ([[evolveSchemaMeta]]); key and order columns must exist in every
    * batch.
    *
    * `onBeforeFirstCommit` is a deterministic-interleaving seam for the
    * conflict specs (runs once, between the first stage and the first
    * commit attempt); production callers leave the default no-op.
    *
    * Returns None for an empty batch, else the commit stats.
    */
  def upsertBucketedOptimistic(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64,
      maxAttempts: Int = 20,
      onBeforeFirstCommit: () => Unit = () => ())(
      batch: DataFrame, batchId: Long): Option[OptimisticCommit] = {
    Files.createDirectories(Paths.get(tablePath))
    // guard BEFORE bucketing: a batch missing a KEY column must surface
    // as the contract message, not as bucketOf's unresolved-column error
    requireKeyOrderCols(batch, keys, order)
    val bucketed = batch
      .withColumn("__bucket", bucketOf(keys, numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = bucketed.select("__bucket").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
      if (touched.isEmpty) return None
      ensureLayout(tablePath, numBuckets)
      var (ver, man, meta) = versionedHeadFull(tablePath)
      // guard the FIRST attempt too: a rebucket can commit between
      // ensureLayout and this head read, and an unchecked first
      // put-if-absent would land old-layout buckets in the new layout's
      // manifest (the retry-path check alone leaves that window open)
      requireLayoutUnchanged(tablePath, numBuckets, meta)
      meta = evolveSchemaMeta(spark, tablePath,
        specMeta(spark, tablePath, meta, keys, order), batch.schema)
      var retries = 0
      var restages = 0
      var hookPending = true
      var committed: Option[OptimisticCommit] = None
      // bounds TOTAL commit attempts — disjoint-race retries of the inner
      // loop included, not just outer re-stages — so a starved writer on
      // a hot table always surfaces as the exception below instead of
      // spinning unboundedly on put-if-absent losses
      var attempt = 0
      while (committed.isEmpty && attempt < maxAttempts) {
        val base = man.filter { case (b, _) => touched.contains(b) }
        // attempt names carry a random suffix: two DRIVERS replaying the
        // same batchId must never race into one staging dir (the lock
        // path's exists-then-pick nextGenName assumes a single writer)
        val gen = s"gen-$batchId-u${java.util.UUID.randomUUID().toString.take(8)}"
        val (_, written) =
          stageAgainst(spark, tablePath, keys, order, bucketed, touched, gen, base)
        var stale = false
        while (committed.isEmpty && !stale && attempt < maxAttempts) {
          attempt += 1
          if (hookPending) { hookPending = false; onBeforeFirstCommit() }
          publishNext(tablePath, ver, man, man ++ written.map(_ -> gen), meta) match {
            case Published =>
              committed = Some(OptimisticCommit(ver + 1, gen, retries, restages))
            case res =>
            retries += 1
            val (v2, m2, meta2) = versionedHeadFull(tablePath)
            // v2 == ver is legal only at ver 0: legacy-manifest drift
            // (the handshake above bailed), where m2 is the fresh legacy
            // map to carry forward on the next attempt
            require(v2 > ver || ver == 0L, staleHeadMsg(tablePath, ver, v2, res))
            requireLayoutUnchanged(tablePath, numBuckets, meta2)
            ver = v2
            man = m2
            meta = evolveSchemaMeta(spark, tablePath,
              specMeta(spark, tablePath, meta2, keys, order), batch.schema)
            // conflict = any bucket WE touched moved since we staged
            stale = touched.exists(b => m2.get(b) != base.get(b))
            if (stale) restages += 1
          }
        }
      }
      Some(committed.getOrElse(throw new IllegalStateException(
        s"$tablePath: optimistic commit lost $maxAttempts commit attempts " +
          s"on batch $batchId — hot-table storm; replay the batch")))
    } finally bucketed.unpersist()
  }

  // ───────────────────────── merge-on-read delta (small-batch) variant ──

  /** Merge-on-READ upsert: stage ONLY the batch's own rows (compacted to
    * one row per key) and APPEND the generation to each touched bucket's
    * manifest chain; the LWW merge against older rows is deferred to
    * [[readBucketedDelta]] (order, then chain recency). The write-
    * amplification complement of [[upsertBucketedOptimistic]]: that path
    * rewrites every touched bucket in full per commit — correct, but at
    * 100 TB a trickle of small batches pays the whole bucket over and
    * over — while this path writes O(batch) bytes per commit and lets
    * [[compactBucketChains]] (auto-triggered past `compactAfter`) fold
    * chains back to one generation, bounding read amplification. The
    * classic copy-on-write vs merge-on-read trade every lakehouse format
    * documents: pick this sink for frequent small batches, the
    * merge-on-write one for rare bulk loads.
    *
    * Concurrency is strictly better than merge-on-write: a staged delta
    * depends on NO base state, so a lost commit race — even on
    * OVERLAPPING buckets — just re-appends to the fresh head's chains
    * and retries. No re-merge, no re-stage, ever (`restages` is 0 by
    * construction). Chain order = commit order, so order-ties resolve
    * to the later COMMIT, exactly [[mergeLww]]'s batch-beats-existing
    * rule replayed at read time; at-least-once redelivery appends a
    * duplicate delta whose rows tie and resolve identically — the
    * replay is a read-level no-op.
    *
    * Interop: chains ride the same versioned-manifest protocol
    * (conflict detection compares chain STRINGS, so appends are visible
    * to merge-on-write racers), and a merge-on-write commit on a
    * chained bucket resolves the chain first — doubling as that
    * bucket's compaction. Same v0→v1 legacy-table migration handshake.
    *
    * Returns None for an empty batch, else the commit stats.
    */
  /** `extraMeta` rides the SAME manifest commit as the data (and every
    * retry re-applies it over the fresh head's meta) — the atomicity a
    * streaming sink's exactly-once marker needs: the Delta
    * `txn (appId, version)` idea on this table's own `#key=value`
    * metadata channel. Keys here OVERRIDE same-named head meta; the
    * reserved layout/spec/schema keys are refused (they have dedicated
    * committers and validators), as are keys/values that would corrupt
    * the line-oriented manifest ('=' in a key, line breaks anywhere).
    *
    * `abortIf` is the transactional half: re-evaluated against the
    * FRESH head metadata before every commit attempt (including CAS
    * retries). True → this batch is skipped — returns None, the staged
    * generation is deleted (never referenced) — which is what makes a
    * metadata high-water an exactly-once marker even under a ZOMBIE
    * writer: a stalled driver whose twin already committed this batch
    * re-reads the advanced marker on its retry and aborts instead of
    * re-committing the data and REGRESSING the marker. (Delta's
    * in-transaction `txn` version check — the check-then-act outside
    * the loop is not enough.)
    */
  def upsertBucketedDelta(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64,
      maxAttempts: Int = 20,
      compactAfter: Int = 8,
      onBeforeFirstCommit: () => Unit = () => (),
      extraMeta: Map[String, String] = Map.empty,
      abortIf: Map[String, String] => Boolean = _ => false,
      extraMetaAt: Long => Map[String, String] = _ => Map.empty)(
      batch: DataFrame, batchId: Long): Option[OptimisticCommit] = {
    require(!extraMeta.keys.exists(k => k == "numBuckets" ||
        k == TombstoneMeta ||
        k == KeySpecMeta || k == OrderSpecMeta || k == SchemaMeta),
      s"extraMeta must not touch the reserved keys (numBuckets, " +
        s"$KeySpecMeta, $OrderSpecMeta, $SchemaMeta, $TombstoneMeta) — " +
        "they have dedicated committers and validators (deletes go " +
        "through deleteBucketedDelta)")
    // the manifest is line-oriented (`#key=value` per line, readAllLines
    // treats \r as a terminator too): a break in either side, or '=' in
    // a key, would corrupt EVERY later read of the table — refuse at
    // the API, not at the wreck
    extraMeta.foreach { case (k, v) =>
      require(k.nonEmpty && !k.exists(c => c == '=' || c == '\n' || c == '\r'),
        s"extraMeta key '$k' must be non-empty without '=', '\\n' or " +
          "'\\r' (it becomes a manifest metadata line)")
      require(!v.exists(c => c == '\n' || c == '\r'),
        s"extraMeta value for '$k' must not contain line breaks " +
          "(it becomes a manifest metadata line)")
    }
    Files.createDirectories(Paths.get(tablePath))
    // guard BEFORE bucketing: a batch missing a KEY column must surface
    // as the contract message, not as bucketOf's unresolved-column error
    requireKeyOrderCols(batch, keys, order)
    val bucketed = batch.withColumn("__bucket", bucketOf(keys, numBuckets))
    locally {
      // stage FIRST, against an EMPTY base: mergeLww degrades to the
      // intra-batch latestByKey compaction (one row per key per delta —
      // two in-batch duplicates must not reach read time, where they'd
      // tie on __seq). Round-19 single-execution staging: the batch plan
      // used to persist + run a touched-buckets distinct/collect BEFORE
      // the stage write re-ran it from the persisted blocks — one extra
      // job, one full materialization and a persist round-trip per
      // commit, on every delta writer (the stream sink's per-trigger
      // path included). With an empty base nothing is merged, so the
      // staged generation's own bucket dirs ARE the touched set: write
      // once, list once. Every head validation (abortIf, layout, schema
      // evolution) already re-runs against the post-stage head below —
      // the freshest base for the first commit attempt — and re-validates
      // on every CAS retry; a batch those checks refuse drops its staged
      // dir instead of never paying it (attempt dirs are write-once and
      // vacuum-reclaimed, so a crash between stage and drop leaks
      // nothing a vacuum won't collect).
      val gen = s"gen-$batchId-u${java.util.UUID.randomUUID().toString.take(8)}"
      mergeLww(None, bucketed, keys, order)
        .write.mode(SaveMode.ErrorIfExists) // attempt dirs are never reused
        .partitionBy("__bucket")
        .parquet(s"$tablePath/$gen")
      val written = listBucketIds(Paths.get(tablePath, gen))
      val touched = written
      def dropStageEarly(): Unit =
        try deleteRecursively(Paths.get(tablePath, gen))
        catch { case _: java.nio.file.NoSuchFileException => () }
      // empty batch: nothing to commit — and the layout sidecar must not
      // materialize off a no-op write to a fresh table
      if (touched.isEmpty) { dropStageEarly(); return None }
      try ensureLayout(tablePath, numBuckets)
      catch { case e: Throwable => dropStageEarly(); throw e }
      var (ver, man, meta) = versionedHeadFull(tablePath)
      // the guard re-checks the head that materialized DURING the stage
      // — and again on every retry below — so a twin writer's advance
      // anywhere in this window aborts instead of re-committing
      def dropStage(): Unit = dropStageEarly()
      var aborted = abortIf(meta)
      if (!aborted) {
        // first-attempt layout guard — same window as the optimistic
        // path: a rebucket committing during the stage must fail this
        // batch loudly, not let its old-layout buckets into the manifest.
        // A refusal here was a free pre-stage refusal before the
        // single-execution reorder — drop the staged dir so it stays one
        try {
          requireLayoutUnchanged(tablePath, numBuckets, meta)
          meta = evolveSchemaMeta(spark, tablePath,
            specMeta(spark, tablePath, meta, keys, order),
            batch.schema) ++ extraMeta
        } catch { case e: Throwable => dropStage(); throw e }
      }
      var retries = 0
      var hookPending = true
      var attempt = 0
      var committed: Option[OptimisticCommit] = None
      while (!aborted && committed.isEmpty && attempt < maxAttempts) {
        attempt += 1
        if (hookPending) { hookPending = false; onBeforeFirstCommit() }
        val entries = man ++ written.map { b =>
          b -> renderChain(man.get(b).map(chainOf).getOrElse(Seq.empty) :+ gen)
        }
        // extraMetaAt sees the VERSION this attempt commits at (ver+1,
        // current per retry) — the channel deleteBucketedDelta uses to
        // record the landed tombstone version for exact feed refusals
        publishNext(tablePath, ver, man, entries,
          meta ++ extraMetaAt(ver + 1)) match {
          case Published =>
            committed = Some(OptimisticCommit(ver + 1, gen, retries, 0))
          case res =>
            retries += 1
            val (v2, m2, meta2) = versionedHeadFull(tablePath)
            if (abortIf(meta2)) aborted = true
            else {
              require(v2 > ver || ver == 0L, staleHeadMsg(tablePath, ver, v2, res))
              requireLayoutUnchanged(tablePath, numBuckets, meta2)
              ver = v2
              man = m2
              meta = evolveSchemaMeta(spark, tablePath,
                specMeta(spark, tablePath, meta2, keys, order),
                batch.schema) ++ extraMeta
            }
        }
      }
      if (aborted) { dropStage(); return None }
      val c = committed.getOrElse(throw new IllegalStateException(
        s"$tablePath: delta commit lost $maxAttempts commit attempts " +
          s"on batch $batchId — hot-table storm; replay the batch"))
      // read-amplification bound: fold any touched chain that crossed the
      // threshold. Best-effort — the batch is already durably committed,
      // so a compaction starved out by racing writers just leaves the
      // chain long for the next trigger to retry
      if (compactAfter > 0 &&
          readManifest(tablePath).exists { case (b, v) =>
            touched.contains(b) && chainOf(v).length > compactAfter })
        try compactBucketChains(spark, tablePath, keys, order,
          minChain = compactAfter + 1, buckets = Some(touched.toSet))
        catch {
          // best-effort means BEST-EFFORT: the batch's commit is already
          // durably published, so NO compaction failure may fail the
          // batch — not the starved-out IllegalStateException, not the
          // vacuum-boundary IllegalArgumentException, not a Spark read
          // of a generation a concurrent vacuum just reclaimed. The
          // chain stays long; the next trigger retries the fold.
          case scala.util.control.NonFatal(_) => ()
        }
      // with auto-compaction DISABLED nothing bounds read amplification
      // — flag runaway chains once per (table, JVM) instead of letting
      // reads quietly decay ([[ChainDriftWarnAt]]). Lengths derive from
      // the in-scope head map (+1 for this commit's append): NO extra
      // listing or manifest read on the hot write path
      if (compactAfter <= 0 && !chainDriftWarned.contains(tablePath))
        warnChainDrift(tablePath, written.map(b =>
          b -> (man.get(b).map(chainOf(_).length).getOrElse(0) + 1)))
      Some(c)
    }
  }

  /** Fold every bucket whose chain has ≥ `minChain` generations (within
    * `buckets`, when given) down to ONE resolved generation, committed
    * through the same optimistic protocol. Correctness under races:
    * a compaction REPLACES exactly the chain prefix it read, so a delta
    * appended while it staged is carried forward behind the compacted
    * generation (rewrite and append commute — the Delta/Iceberg
    * rewrite-vs-append rule); if a bucket's prefix itself changed
    * (another compactor, or a merge-on-write commit), the staged fold is
    * stale for that bucket and the whole pass re-stages against the new
    * head. Old delta generations become unreferenced and are reclaimed
    * by [[vacuumGenerations]] under its usual reader-grace window.
    *
    * Returns the bucket ids compacted (empty when no chain qualifies).
    */
  def compactBucketChains(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      minChain: Int = 2,
      buckets: Option[Set[Long]] = None,
      maxAttempts: Int = 20,
      onBeforeFirstCommit: () => Unit = () => ()): Seq[Long] =
    rewriteChainPrefixes(spark, tablePath, keys, order,
      // chains only exist on versioned tables, so the helper's v0
      // no-op can never hide work here
      selectTargets = man => man.filter { case (b, v) =>
        chainOf(v).length >= math.max(minChain, 2) &&
          buckets.forall(_.contains(b))
      },
      // the fold is the plain LWW resolve: one row per key per bucket,
      // so every target bucket survives it
      fold = identity,
      genPrefix = "gen-compact", what = "compaction",
      maxAttempts = maxAttempts, onBeforeFirstCommit = onBeforeFirstCommit)

  /** The shared stage→CAS-commit loop behind [[compactBucketChains]]
    * and [[purgeTombstones]]: pick target chains at the current head,
    * stage `fold(LWW-resolve(targets))` as ONE generation, and commit
    * entries replacing each target's chain PREFIX while carrying
    * forward deltas appended during the stage. The concurrency rules
    * live here ONCE:
    *
    *  - the fold rewrites rows under the caller's LWW spec — same
    *    writer-side spec handshake as every committer;
    *  - a changed prefix — or a bucket id a concurrent SHRINKING
    *    rebucket removed from the map — is a STALE fold: re-stage
    *    against the new head, never crash;
    *  - CAS retries refresh metadata from the head that beat them —
    *    committing the outer read's meta would silently REVERT a
    *    concurrent advance (a streaming sink's `stream.<id>`
    *    high-water, an evolved schema contract);
    *  - a bucket whose rewrite emitted nothing (a purge emptied it)
    *    and gained no deltas since leaves the manifest;
    *  - a stale or attempt-exhausted fold reclaims its own staged
    *    directory eagerly (provably unreferenced — its commit never
    *    published; the delta committer's dropStage discipline).
    */
  private def rewriteChainPrefixes(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      selectTargets: Map[Long, String] => Map[Long, String],
      fold: DataFrame => DataFrame,
      genPrefix: String,
      what: String,
      maxAttempts: Int,
      onBeforeFirstCommit: () => Unit): Seq[Long] = {
    var attempt = 0
    var hookPending = true
    while (attempt < maxAttempts) {
      val (ver, man, meta0) = versionedHeadFull(tablePath)
      // a v0/legacy table has no versioned chains to rewrite — the
      // blanket-maintenance-sweep answer is the empty no-op
      if (ver < 1L) return Seq.empty
      var meta = specMeta(spark, tablePath, meta0, keys, order)
      val targets = selectTargets(man)
      if (targets.isEmpty) return Seq.empty
      val gen = s"$genPrefix-u${java.util.UUID.randomUUID().toString.take(8)}"
      fold(resolveChainRead(
        readManifestBuckets(spark, tablePath, targets).get, targets,
        keys, order))
        .write.mode(SaveMode.ErrorIfExists) // attempt dirs are never reused
        .partitionBy("__bucket")
        .parquet(s"$tablePath/$gen")
      val written = listBucketIds(Paths.get(tablePath, gen)).toSet
      var head = (ver, man)
      var stale = false
      while (!stale && attempt < maxAttempts) {
        attempt += 1
        if (hookPending) { hookPending = false; onBeforeFirstCommit() }
        val (v, m) = head
        val next = targets.keys.toSeq.sorted.foldLeft(Option(m)) {
          case (None, _) => None
          case (Some(acc), b) =>
            val before = chainOf(targets(b))
            m.get(b).map(chainOf) match {
              case Some(now) if now.startsWith(before) =>
                val suffix = now.drop(before.length)
                val chain =
                  (if (written.contains(b)) Seq(gen) else Seq.empty) ++ suffix
                if (chain.isEmpty) Some(acc - b)
                else Some(acc + (b -> renderChain(chain)))
              case _ => None // rewritten/removed under us → stale
            }
        }
        next match {
          case None => stale = true
          case Some(entries) =>
            val res = tryCommitSuccessor(tablePath, v, entries, meta)
            if (res == Published) return targets.keys.toSeq.sorted
            val (v2, m2, meta2) = versionedHeadFull(tablePath)
            require(v2 > v, staleHeadMsg(tablePath, v, v2, res))
            head = (v2, m2)
            meta = specMeta(spark, tablePath, meta2, keys, order)
        }
      }
      try deleteRecursively(Paths.get(tablePath, gen))
      catch { case _: java.nio.file.NoSuchFileException => () }
    }
    throw new IllegalStateException(
      s"$tablePath: $what lost $maxAttempts commit attempts — " +
        "hot-table storm; retry when the write rate drops")
  }

  /** Tombstone GC: physically remove tombstone rows whose WINNING
    * position the operator declares past the replay horizon — the
    * second half of a forget request (a tombstone still names the key;
    * true removal needs the marker itself gone). `purgeIf` is a
    * predicate over the tombstone row's columns (typically the order
    * column: `col("ts") < lit(horizon)`); only rows that are BOTH
    * tombstones AND match it are dropped. Superseded tombstones (a
    * later upsert re-created the key) vanish in any full fold for free
    * — this entry point exists for WINNING tombstones, which folds must
    * otherwise preserve.
    *
    * THE CONTRACT, stated loudly: after a purge, an event for the
    * purged key REPLAYED with an order below the old tombstone's will
    * RESURRECT the key — the operator declares such replays impossible
    * (the same replay-window judgment [[adviseRetention]] informs; run
    * purges behind the retention horizon). The resolved image is
    * UNCHANGED by the purge itself (the key already read as absent), so
    * change feeds across the purge version report nothing. Historical
    * manifests keep the tombstone until [[vacuumGenerations]] reclaims
    * their generations — a complete forget is purge + vacuum past the
    * reader grace.
    *
    * Mechanics: detect the buckets holding matching WINNING tombstones
    * (a column-pruned raw scan prunes candidates, then the candidates'
    * resolved image confirms the tombstone wins its key — a bucket
    * whose only matches are superseded is NOT rewritten and NOT
    * reported), fold each confirmed bucket's
    * FULL chain, drop the matching tombstone winners, and commit
    * through the same optimistic protocol as [[compactBucketChains]] —
    * a bucket whose fold empties entirely leaves the manifest; deltas
    * appended during the stage are carried forward behind the fold; a
    * changed prefix re-stages. Returns the bucket ids rewritten.
    */
  def purgeTombstones(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      purgeIf: Column,
      maxAttempts: Int = 20,
      onBeforeFirstCommit: () => Unit = () => ()): Seq[Long] = {
    // SQL-NULL discipline: tombstone rows null-fill every non key/order
    // column, so a predicate touching one evaluates NULL there —
    // coalesce to false on BOTH the detection and the fold, or the
    // fold's negation would DROP (NULL filters out) a tombstone the
    // operator never affirmatively matched
    val matches = coalesce(col(TombstoneCol), lit(false)) &&
      coalesce(purgeIf, lit(false))
    rewriteChainPrefixes(spark, tablePath, keys, order,
      // detection, two stages: (1) a cheap RAW-row prune — which buckets
      // hold any matching tombstone row at all (marker + predicate +
      // bucket columns; parquet prunes the rest) — then (2) confirm on
      // the candidates' RESOLVED image that a matching tombstone actually
      // WINS its key. Raw-only detection folded — and reported in the
      // returned bucket ids — buckets whose only matches were already
      // superseded by a later upsert (those vanish in any fold for free;
      // rewriting for them is pure work amplification and a misleading
      // return value). The confirm pays one windowed read of the
      // candidate buckets only — bounded by the raw prune, and strictly
      // cheaper than the rewrite it avoids.
      selectTargets = man =>
        readManifestBuckets(spark, tablePath, man)
          .filter(_.columns.contains(TombstoneCol)) match {
          case None => Map.empty
          case Some(df) =>
            val cand = df.filter(matches).select("__bucket").distinct()
              .collect().map(_.getLong(0)).toSet // bounded by numBuckets
            val candMan = man.filter { case (b, _) => cand.contains(b) }
            if (candMan.isEmpty) Map.empty
            else {
              val winning = resolveChainRead(
                readManifestBuckets(spark, tablePath, candMan).get,
                candMan, keys, order)
                .filter(matches).select("__bucket").distinct()
                .collect().map(_.getLong(0)).toSet
              man.filter { case (b, _) => winning.contains(b) }
            }
        },
      fold = _.filter(!matches),
      genPrefix = "gen-purge", what = "purge",
      maxAttempts = maxAttempts, onBeforeFirstCommit = onBeforeFirstCommit)
  }

  /** Online re-bucketing: re-hash the WHOLE table into `newBuckets`
    * hash partitions and swap layout + data in ONE optimistic manifest
    * commit. At 100 TB a table that outgrew its bucket count (buckets
    * sized for co-located merges now hold many files each) needs a
    * resize that is an ordinary versioned commit, not an offline
    * rebuild: readers before the swap resolve the old manifest (old
    * layout, old generations — still retained for time travel under the
    * vacuum grace), readers after it resolve the new one, and nothing
    * in between can observe a mixed layout because the `#numBuckets`
    * metadata rides the SAME manifest file as the new bucket map.
    *
    * Writer safety: the commit goes through the same put-if-absent
    * chain as every upsert, so a batch committed between this rewrite's
    * stage and its publish forces a full re-stage here (the staged
    * image is the whole table — ANY head movement invalidates it),
    * while a writer whose batch was staged under the OLD layout and
    * loses its own race to this commit fails loudly
    * ([[requireLayoutUnchanged]]) instead of scattering keys across two
    * hash functions. Writers configured with the old count are refused
    * at their next batch by [[ensureLayout]] (manifest metadata
    * overrides the now-stale `_layout` sidecar).
    *
    * The rewrite doubles as a full compaction (chains resolve before
    * re-hashing). Returns the committed version.
    */
  def rebucketTable(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      newBuckets: Int,
      maxAttempts: Int = 5,
      onBeforeFirstCommit: () => Unit = () => ()): Long = {
    require(newBuckets >= 1, s"newBuckets must be >= 1 (got $newBuckets)")
    var attempt = 0
    var hookPending = true
    while (attempt < maxAttempts) {
      attempt += 1
      val (ver, man, meta0) = versionedHeadFull(tablePath)
      require(man.nonEmpty,
        s"$tablePath has no committed data — delete and recreate an empty " +
          "table with the new bucket count instead of rebucketing it")
      // same writer-side spec handshake as every committer (the rewrite
      // LWW-resolves under this spec); a rebucket on a pre-spec table
      // records the spec alongside the new layout
      val meta = specMeta(spark, tablePath, meta0, keys, order)
      val old = meta.get("numBuckets").map(_.toInt).orElse(readLayout(tablePath))
      require(!old.contains(newBuckets),
        s"$tablePath already has numBuckets=$newBuckets")
      // resolve the full table at this head (the LWW resolve makes the
      // rewrite a compaction too), re-hash, stage as one generation
      val gen = s"gen-rebucket-u${java.util.UUID.randomUUID().toString.take(8)}"
      val resolved = resolveChainRead(
        readManifestBuckets(spark, tablePath, man).get, man, keys, order)
      resolved
        .withColumn("__bucket", bucketOf(keys, newBuckets))
        .write.mode(SaveMode.ErrorIfExists)
        .partitionBy("__bucket")
        .parquet(s"$tablePath/$gen")
      val written = listBucketIds(Paths.get(tablePath, gen))
      // the new map REPLACES the old one in full: old bucket ids vanish
      // (their generations become vacuum-reclaimable), the metadata
      // records the new layout atomically with it
      val entries = written.map(_ -> gen).toMap
      if (hookPending) { hookPending = false; onBeforeFirstCommit() }
      publishNext(tablePath, ver, man, entries,
        meta + ("numBuckets" -> newBuckets.toString)) match {
        case Published => return ver + 1
        case res =>
          val (v2, _) = versionedHead(tablePath)
          require(v2 > ver || ver == 0L, staleHeadMsg(tablePath, ver, v2, res))
          // ANY concurrent commit invalidates a whole-table image —
          // loop back and re-stage against the new head
      }
    }
    throw new IllegalStateException(
      s"$tablePath: rebucket lost $maxAttempts full-rewrite attempts to " +
        "concurrent commits — quiesce or throttle writers and retry")
  }

  // ─────────────────────────── bucket-count advisor (operational) ──

  /** One bucket's physical health at the current head: live data files
    * and bytes across its generation chain, and the chain length.
    */
  final case class BucketStats(bucket: Long, files: Long, bytes: Long,
      chainLen: Int)

  /** Per-bucket physical stats from the head manifest + file listing —
    * driver-side METADATA (one directory listing per (bucket,
    * generation) pair, the same class of work as vacuum), never a data
    * scan. The operational input [[adviseRebucket]] reads.
    */
  def tableStats(tablePath: String): Seq[BucketStats] = {
    import scala.jdk.CollectionConverters._
    readManifest(tablePath).toSeq.sortBy(_._1).map { case (b, chain) =>
      val gens = chainOf(chain)
      var files = 0L
      var bytes = 0L
      gens.foreach { g =>
        val dir = Paths.get(tablePath, g, s"__bucket=$b")
        // tolerate concurrent reclamation (vacuum/compaction deleting a
        // superseded generation between the manifest snapshot and this
        // listing): a read-only advisor returns slightly-stale stats,
        // never a NoSuchFileException — the markers() discipline
        try {
          if (Files.isDirectory(dir)) {
            val s = Files.list(dir)
            try s.iterator().asScala.foreach { p =>
              val n = p.getFileName.toString
              if (!n.startsWith(".") && !n.startsWith("_")) {
                files += 1
                bytes += scala.util.Try(Files.size(p)).getOrElse(0L)
              }
            } finally s.close()
          }
        } catch {
          case _: java.nio.file.NoSuchFileException => ()
          case e: java.io.UncheckedIOException
              if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => ()
        }
      }
      BucketStats(b, files, bytes, gens.length)
    }
  }

  /** A recommendation to resize — see [[adviseRebucket]]. */
  final case class RebucketAdvice(currentBuckets: Int,
      recommendedBuckets: Int, totalBytes: Long, maxChainLen: Int,
      reason: String)

  /** Should this table be re-bucketed? A bucket count is sized so one
    * bucket holds roughly a task's worth of data (`targetBytesPerBucket`
    * — default 1 GiB, the usual parquet task envelope); a table that
    * outgrew its count concentrates many files per bucket (long merge
    * chains, fat co-located joins), one that shrank far below it pays
    * per-bucket overheads for near-empty directories. Recommends the
    * next power of two that puts the CURRENT total bytes at the target,
    * with a 2× hysteresis band so healthy tables are never churned:
    * None unless the recommendation is at least a doubling or a
    * halving. The resize itself is [[rebucketTable]] — one atomic
    * versioned commit (see the README runbook).
    *
    * Advice, not a contract: bytes are measured at the head (chains
    * included, so a badly-chained table reads bigger than its resolved
    * size — compaction first gives a truer measure; `maxChainLen` in
    * the advice flags that).
    */
  def adviseRebucket(tablePath: String,
      targetBytesPerBucket: Long = 1L << 30,
      minBuckets: Int = 16): Option[RebucketAdvice] =
    adviseRebucketWith(tablePath, tableStats(tablePath),
      targetBytesPerBucket, minBuckets)

  /** [[adviseRebucket]] over a caller-supplied [[tableStats]] snapshot
    * — the advise verb computes stats ONCE and feeds both this and the
    * compact advisor instead of paying the per-(bucket, generation)
    * directory walk twice per scan.
    */
  private[graft] def adviseRebucketWith(tablePath: String,
      stats: Seq[BucketStats],
      targetBytesPerBucket: Long = 1L << 30,
      minBuckets: Int = 16): Option[RebucketAdvice] = {
    require(targetBytesPerBucket >= 1, "targetBytesPerBucket must be >= 1")
    require(minBuckets >= 1, "minBuckets must be >= 1")
    if (stats.isEmpty) return None
    val nb = effectiveNumBuckets(tablePath).getOrElse(return None)
    val total = stats.map(_.bytes).sum
    val ideal = math.max(1L,
      (total + targetBytesPerBucket - 1) / targetBytesPerBucket)
    var rec0 = 1L
    while (rec0 < ideal) rec0 <<= 1
    // shrink advice floors at `minBuckets` — per-bucket overheads only
    // matter at scale, and "shrink your 4-bucket test table to 1" is
    // churn, not advice; a floor at or above the current count means
    // the table is simply healthy
    val rec = if (rec0 < nb) math.max(rec0, minBuckets.toLong) else rec0
    // a shrink floored to at-or-above the current count is "healthy",
    // never re-read as growth advice
    if (rec0 < nb && rec >= nb) return None
    if (rec >= 2L * nb || rec <= nb / 2L) Some(RebucketAdvice(
      nb, rec.toInt, total, stats.map(_.chainLen).max,
      if (rec > nb)
        s"$total bytes over $nb buckets ≈ ${total / math.max(1, nb)} " +
          s"bytes/bucket, past the $targetBytesPerBucket target — " +
          s"rebucketTable(..., $rec)"
      else
        s"$total bytes over $nb buckets ≈ ${total / math.max(1, nb)} " +
          s"bytes/bucket, far under the $targetBytesPerBucket target — " +
          s"rebucketTable(..., $rec) cuts per-bucket overheads"))
    else None
  }

  /** Chain-drift warning threshold for writers that DISABLED
    * auto-compaction (`compactAfter = 0`): nothing else bounds read
    * amplification there, so the writer flags a touched chain past this
    * length once per (table, JVM).
    */
  private[graft] val ChainDriftWarnAt: Int = 32

  /** Telemetry seam for the chain-drift warning (default: stderr). */
  private[graft] var onChainDrift: (String, Long, Int) => Unit =
    (table, bucket, len) => System.err.println(
      s"[graft] $table: bucket $bucket's generation chain is $len long " +
        s"(auto-compaction disabled) — reads pay the whole chain; run " +
        "compactBucketChains, or re-enable compactAfter")

  private val chainDriftWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** `lengths` = the committed chain lengths of this batch's buckets,
    * derived by the caller from state already in scope — this must stay
    * free on the hot write path (no listing, no manifest read), and it
    * can fire at most once per (table, JVM) anyway.
    */
  private def warnChainDrift(tablePath: String,
      lengths: Seq[(Long, Int)]): Unit = {
    lengths.maxByOption(_._2).foreach { case (b, len) =>
      if (len > ChainDriftWarnAt && chainDriftWarned.add(tablePath))
        onChainDrift(tablePath, b, len)
    }
  }

  /** Write + force to stable storage, so the atomic rename promotes a
    * fully-persisted file (rename-over-unsynced-data can survive a crash
    * as an empty manifest on some filesystems).
    */
  private[sink] def writeFsynced(p: Path, bytes: Array[Byte]): Unit = {
    import java.nio.file.StandardOpenOption._
    val ch = java.nio.channels.FileChannel.open(p, CREATE, WRITE, TRUNCATE_EXISTING)
    try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) }
    finally ch.close()
  }

  /** Best-effort directory fsync (some filesystems refuse opening a
    * directory for read — durability then falls back to the file fsync).
    */
  private[sink] def fsyncDir(dir: Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(dir, java.nio.file.StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: java.io.IOException => () }

  /** Current bucket → generation mapping; empty before the first commit.
    * When a VERSIONED manifest chain exists ([[upsertBucketedOptimistic]]),
    * its head is authoritative; otherwise the lock-path `_manifest` file.
    * A table upgraded to the optimistic protocol therefore keeps reading
    * correctly through the same entry point.
    */
  def readManifest(tablePath: String): Map[Long, String] =
    versionedHead(tablePath)._2

  /** The lock-path `_manifest` file (pre-versioned format). */
  private def legacyManifest(tablePath: String): Map[Long, String] = {
    val p = Paths.get(tablePath, "_manifest")
    if (!Files.exists(p)) Map.empty else parseManifest(p)
  }

  private def parseManifest(p: Path): Map[Long, String] = {
    import scala.jdk.CollectionConverters._
    parseManifestLines(Files.readAllLines(p).asScala.toSeq)
  }

  private def parseManifestLines(lines: Seq[String]): Map[Long, String] =
    lines
      .filter(l => l.nonEmpty && !l.startsWith("#")) // `#` = metadata lines
      .map { line =>
        val Array(b, g) = line.split(",", 2)
        b.toLong -> g
      }.toMap

  /** Manifest metadata lines (`#key=value`). Keys today: `numBuckets`
    * (written ONLY by [[rebucketTable]] — riding the manifest makes a
    * layout change atomic with the data swap that implements it; a
    * separate sidecar update would leave a crash window where the
    * manifest's new-layout buckets read under the old hash),
    * `keySpec`/`orderSpec` (the self-describing table spec, r17) and
    * `schema` (the column contract, r17). Every committer carries the
    * head's metadata forward (validating/evolving the r17 keys);
    * pre-meta tables keep resolving their layout from the `_layout`
    * sidecar.
    */
  private def parseMetaLines(lines: Seq[String]): Map[String, String] =
    lines
      .filter(l => l.startsWith("#") && l.contains("="))
      .map { l =>
        val Array(k, v) = l.stripPrefix("#").split("=", 2)
        k -> v
      }.toMap

  // ─────────────────── self-describing key/order spec (manifest meta) ──

  private[graft] val KeySpecMeta = "keySpec"
  private[graft] val OrderSpecMeta = "orderSpec"

  /** Canonical string form of ONE LWW order expression for the spec
    * metadata: a bare attribute's (possibly dotted) name, else the
    * expression's SQL text — both re-parseable by
    * `org.apache.spark.sql.functions.expr`. Canonicalizing through the
    * converted catalyst tree makes `col("ts")`, `df("ts")` and the
    * re-parsed stored form compare equal.
    */
  private def canonicalOrderOne(spark: SparkSession, c: Column): String =
    org.apache.spark.sql.graft.Bridge.convertedExpression(spark, c) match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.map(quotePart).mkString(".")
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        quotePart(a.name)
      case other => other.sql
    }

  /** Backquote an identifier part — ALWAYS. A conditional "plain words
    * stay bare" rule has two parse traps the second review pass caught:
    * a digit-led name (`2d` re-parses as the DOUBLE literal 2.0 — LWW
    * by a constant, the silent-wrong class again) and SQL keywords
    * (`order` fails to parse under enforced-reserved-keywords configs).
    * A backquoted identifier parses as an attribute under every
    * configuration, and canonicalization is stable because BOTH the
    * writer's spec and the re-parsed stored one pass through here
    * (backticks double inside, the SQL parser's escape).
    */
  private def quotePart(part: String): String =
    "`" + part.replace("`", "``") + "`"


  private def canonicalOrder(spark: SparkSession, order: Seq[Column]): String =
    order.map(c => escapeSpecPart(canonicalOrderOne(spark, c))).mkString(",")

  private def canonicalKeys(keys: Seq[String]): String =
    keys.map(escapeSpecPart).mkString(",")

  /** Spec parts join with `,`; a part containing `,` or `\` escapes
    * them (`\,` / `\\`). Newlines cannot ride a manifest line at all —
    * refused loudly at record time rather than silently truncated.
    */
  private def escapeSpecPart(s: String): String = {
    require(!s.exists(ch => ch == '\n' || ch == '\r'),
      s"key/order spec part contains a newline and cannot be recorded " +
        s"in manifest metadata: '${s.take(60)}'")
    s.replace("\\", "\\\\").replace(",", "\\,")
  }

  private def splitSpecParts(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 2 }
      else if (ch == ',') { out += cur.toString(); cur.clear(); i += 1 }
      else { cur.append(ch); i += 1 }
    }
    out += cur.toString()
    out.toSeq
  }

  /** The table's PERSISTED key/LWW-order spec — recorded by the first
    * versioned commit (round 17+ writers), so every reader can default
    * to the spec the table was actually written with instead of
    * re-supplying it per call (an `orderBy` that differs from the
    * writer's resolves ties differently than the table's own reads —
    * a silent-wrong-LWW class this metadata kills). None for tables
    * written before the spec was recorded or never versioned-committed;
    * one commit with a current writer records it in place.
    */
  def storedSpec(tablePath: String): Option[(Seq[String], Seq[Column])] = {
    val meta = versionedHeadFull(tablePath)._3
    (meta.get(KeySpecMeta), meta.get(OrderSpecMeta)) match {
      case (Some(k), Some(o)) =>
        Some((splitSpecParts(k), splitSpecParts(o).map(expr)))
      case _ => None
    }
  }

  private def mustStoredSpec(tablePath: String): (Seq[String], Seq[Column]) =
    storedSpec(tablePath).getOrElse(throw new IllegalStateException(
      s"$tablePath carries no key/order spec metadata (written before " +
        "the spec was recorded, or no versioned commit yet) — pass keys " +
        "and order explicitly; one commit with a current writer records " +
        "the spec for every future reader"))

  /** Writer-side spec handshake, run on every commit attempt with the
    * freshest head metadata: a table that already carries a spec REFUSES
    * a writer whose keys/order differ (a mismatched writer would commit
    * rows whose LWW resolution disagrees with every other read of the
    * table — the silent corruption class this metadata exists to kill);
    * a table without one (first versioned commit, or pre-spec history)
    * records this writer's.
    */
  private def specMeta(spark: SparkSession, tablePath: String,
      meta: Map[String, String], keys: Seq[String],
      order: Seq[Column]): Map[String, String] = {
    val k = canonicalKeys(keys)
    val o = canonicalOrder(spark, order)
    (meta.get(KeySpecMeta), meta.get(OrderSpecMeta)) match {
      case (None, None) =>
        // RECORD-time round-trip guard: a spec that does not re-parse
        // and canonicalize back to itself would strand every future
        // path-only reader on an opaque parse error — refuse to record
        // it, loudly, at the one moment the caller can still pick a
        // simpler order expression. (Residual caveat, documented on
        // [[storedSpec]]: catalyst's own SQL rendering leaves keyword
        // column names bare inside COMPOSITE expressions, which
        // round-trips under the default parser but fails on a cluster
        // running spark.sql.ansi.enforceReservedKeywords=true — the
        // failure there is this same loud parse error at read time,
        // never a silent wrong answer.)
        splitSpecParts(o).foreach { part =>
          val back = scala.util.Try(canonicalOrderOne(spark, expr(part)))
          require(back.toOption.contains(part),
            s"order expression '$part' does not round-trip through its " +
              "stored SQL form (re-parse gave " +
              s"${back.fold(e => s"error: ${e.getMessage}", v => s"'$v'")}) " +
              "— it cannot be persisted as the table's spec; use plain " +
              "column references or a simpler expression")
        }
        meta + (KeySpecMeta -> k) + (OrderSpecMeta -> o)
      case (sk, so) =>
        require(sk.forall(_ == k) && so.forall(_ == o),
          s"$tablePath was committed with keys=[${sk.getOrElse("")}] " +
            s"order=[${so.getOrElse("")}] but this caller supplies " +
            s"keys=[$k] order=[$o] — a mismatched spec silently changes " +
            "LWW winners; use the stored spec (storedSpec/the no-spec " +
            "read overloads), or rebuild the table deliberately")
        // one absent + one present is a hand-edited manifest; the
        // require above already refused unless the present one matches,
        // so re-record the pair for consistency
        meta + (KeySpecMeta -> k) + (OrderSpecMeta -> o)
    }
  }

  /** Reader-side spec handshake: an explicit spec that disagrees with
    * the table's stored one is refused loudly (same corruption class as
    * the writer-side check — a reader with a different order resolves
    * ties differently than the table's own reads). Tables without
    * stored specs validate nothing. The spec is immutable once recorded
    * (every committer re-validates it), so reading it outside the
    * caller's manifest snapshot cannot race a spec change.
    */
  private[graft] def requireSpecMatches(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column]): Unit = {
    val meta = versionedHeadFull(tablePath)._3
    if (meta.contains(KeySpecMeta) || meta.contains(OrderSpecMeta))
      specMeta(spark, tablePath, meta, keys, order)
  }

  // ───────────────────── schema-evolution contract (manifest meta) ──

  private[graft] val SchemaMeta = "schema"

  /** Engine scratch columns the schema contract never records. */
  private def userFields(schema: org.apache.spark.sql.types.StructType)
      : Seq[org.apache.spark.sql.types.StructField] =
    schema.fields.toSeq.filterNot(f =>
      f.name == "__bucket" || f.name == "__seq" || f.name == TombstoneCol)

  // ──────────────────────────────── event-sourced deletes (r17) ──

  /** Engine-internal delete marker: a tombstone row competes in the
    * LWW rank like any version-row (event-sourced deletes stay
    * replay-deterministic — a tombstone ordered above a key's rows
    * deletes it, a LATER upsert ordered above the tombstone re-creates
    * it, a replayed older event still loses), and a winner flagged
    * tombstone makes its key ABSENT from every resolved read. Physical
    * rewrites (compaction folds, rebuckets) deliberately KEEP winning
    * tombstone rows: dropping one would let a replayed older event
    * silently resurrect the key.
    */
  private[graft] val TombstoneCol = "__tombstone"

  /** Manifest metadata set by every [[deleteBucketedDelta]] commit (and
    * carried forward by every committer): the VERSION of the LATEST
    * delete. The PLAIN upsert feed cannot represent a deletion, so a
    * plain feed refuses any range STARTING below this version (a delete
    * could sit inside it); ranges starting at-or-after it are provably
    * complete (every tombstone is ≤ from, so both endpoint images
    * already exclude the deleted keys) and keep reading plainly.
    * Legacy boolean values ("true") parse as unknown-version → refuse
    * every range, the conservative direction.
    */
  private[graft] val TombstoneMeta = "hasTombstones"

  /** The resolved-read seam for deletes: winners flagged tombstone
    * leave the result (the key reads as absent) and the marker column
    * never escapes to callers. Physical paths (stage merges, compaction
    * folds, rebucket rewrites) deliberately do NOT run this — they
    * carry tombstone rows forward.
    */
  private def dropTombstones(df: DataFrame): DataFrame =
    if (!df.columns.contains(TombstoneCol)) df
    else df.filter(!coalesce(col(TombstoneCol), lit(false))).drop(TombstoneCol)

  /** The table's COMMITTED column contract (names + types), recorded at
    * the first versioned commit and widened by every column-adding
    * batch since. None for tables written before the contract existed
    * (their next commit records it) or never versioned-committed.
    */
  def storedSchema(tablePath: String)
      : Option[org.apache.spark.sql.types.StructType] =
    versionedHeadFull(tablePath)._3.get(SchemaMeta).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Writer-side schema contract for the versioned committers, run on
    * every commit attempt with the freshest head metadata. The contract,
    * chosen deliberately (pre-contract behavior was whatever parquet
    * union does — including silent int→long-style coercion at read
    * time):
    *
    *  - the first versioned commit RECORDS the batch's columns;
    *  - a batch may ADD columns — widen-with-nulls (older rows read
    *    null there), and the recorded contract grows atomically with
    *    the commit;
    *  - a batch RETYPING a committed column is refused loudly — the
    *    per-generation union would otherwise silently coerce values
    *    (or fail far away at read time with no writer to blame);
    *  - a batch DROPPING a committed column is refused loudly — the
    *    LWW merge would silently null-fill it on every row the batch
    *    wins, which reads as data loss; a caller that really means it
    *    carries the column explicitly (`lit(null).cast(...)`).
    *
    * The lock-path sinks ([[upsertBucketed]]/[[upsertBucketedAtomic]])
    * keep the legacy permissive union — they have no metadata channel;
    * the versioned protocol is the 100 TB path and gets the contract.
    */
  private def evolveSchemaMeta(spark: SparkSession, tablePath: String,
      meta: Map[String, String],
      batchSchema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    import org.apache.spark.sql.types.{DataType, StructField, StructType}
    val resolver = spark.sessionState.conf.resolver
    val batchFields = userFields(batchSchema)
    meta.get(SchemaMeta) match {
      case None =>
        // nullability is normalized away (every column is nullable under
        // the merge's null back-fill anyway): the contract is names+types
        meta + (SchemaMeta -> StructType(
          batchFields.map(f => StructField(f.name, f.dataType))).json)
      case Some(json) =>
        val stored = DataType.fromJson(json).asInstanceOf[StructType]
        val retyped = batchFields.flatMap { f =>
          stored.fields.find(s => resolver(s.name, f.name))
            .filter(_.dataType.catalogString != f.dataType.catalogString)
            .map(s => s"${f.name} (table: ${s.dataType.catalogString}, " +
              s"batch: ${f.dataType.catalogString})")
        }
        require(retyped.isEmpty,
          s"$tablePath: batch retypes committed column(s) " +
            s"${retyped.mkString("; ")} — the per-generation union would " +
            "silently coerce values across generations; cast the batch " +
            "to the table's committed types, or rebuild the table " +
            "deliberately")
        val dropped = stored.fields.toSeq
          .filterNot(s => batchFields.exists(f => resolver(f.name, s.name)))
        require(dropped.isEmpty,
          s"$tablePath: batch drops committed column(s) " +
            s"${dropped.map(_.name).mkString(", ")} — the LWW merge would " +
            "silently null-fill them on every row this batch wins (reads " +
            "as data loss); carry them explicitly " +
            "(lit(null).cast(<type>)) if that is really intended")
        val added = batchFields
          .filterNot(f => stored.fields.exists(s => resolver(s.name, f.name)))
        if (added.isEmpty) meta
        else meta + (SchemaMeta -> StructType(stored.fields.toSeq ++
          added.map(f => StructField(f.name, f.dataType))).json)
    }
  }

  /** A manifest VALUE is a `;`-joined generation chain, oldest first:
    * merge-on-write commits ([[upsertBucketedAtomic]] /
    * [[upsertBucketedOptimistic]]) always write single-element chains
    * (the plain `gen` string — the pre-chain format reads back
    * unchanged), while [[upsertBucketedDelta]] APPENDS one generation
    * per commit and defers the LWW merge to read time. Generation names
    * never contain `,` or `;`.
    */
  private[graft] def chainOf(value: String): Seq[String] =
    value.split(";").toSeq.filter(_.nonEmpty)

  private def renderChain(gens: Seq[String]): String = gens.mkString(";")

  /** Does any bucket of `entries` carry a multi-generation chain (i.e.
    * rows that still need a read-time LWW resolve)?
    */
  private def hasChains(entries: Map[Long, String]): Boolean =
    entries.valuesIterator.exists(_.contains(';'))

  /** Read the given bucket→chain entries, one scan per distinct
    * (generation, chain position) pair (basePath keeps the `__bucket=N`
    * partition column), cast back to the writer's long type. None when
    * no entry exists yet. The returned frame carries `__seq` = the
    * generation's position in ITS bucket's chain: keys never compete
    * across buckets, so per-bucket positions are a sound LWW recency
    * axis even though one generation may sit at different depths in
    * different buckets' chains.
    *
    * Generations union BY NAME with null back-fill (each generation was
    * written in one shot, so its own schema is uniform — per-generation
    * scans are what makes schema evolution O(1) footer reads instead of
    * a whole-table mergeSchema pass); the deterministic generation order
    * fixes where appended columns land in the output schema.
    */
  private def readManifestBuckets(
      spark: SparkSession,
      tablePath: String,
      entries: Map[Long, String]): Option[DataFrame] = {
    val triples = for {
      (b, v) <- entries.toSeq
      (gen, pos) <- chainOf(v).zipWithIndex
    } yield (gen, pos, b)
    readBucketTriples(spark, tablePath, triples)
  }

  /** Per-generation inferred-schema cache (round-19 optimization):
    * every `spark.read.parquet` of a generation pays a schema-inference
    * job (one driver-side footer read, ~25-35 ms) BEFORE the real scan,
    * and a chain resolve reads one generation per chain link — a
    * steady-state view refresh was paying 4-7 such jobs per invocation
    * for footers it had already read. Generation dirs are write-once
    * (attempt dirs are never reused; vacuum only ever deletes), so the
    * inferred schema is safely memoizable per JVM. The key carries the
    * gen dir's mtime so the one legal mutation — a table deleted and
    * re-created at the same path (dev/test loops) — misses the cache
    * instead of serving a stale schema. Bounded: entries are a few KB
    * and vacuumed gens stop being requested; a 4096-entry clear guards
    * pathological long-lived JVMs.
    */
  private val genSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, java.nio.file.attribute.FileTime),
    org.apache.spark.sql.types.StructType]()

  /** Scan an explicit set of (generation, chain position, bucket)
    * entries — [[readManifestBuckets]]'s core, also used by the change
    * feed's append fast path to read a chain SUFFIX at its true
    * positions.
    *
    * Round-19 scan shape: one read per generation, schema pinned from
    * [[genSchemaCache]] (no per-read inference job), and the scan
    * coalesced to ~128 MB input per task. Without the coalesce, Spark's
    * parallelism-first split sizing (`spark.sql.files.minPartitionNum`
    * defaults to the core count) gives every small bucket FILE its own
    * task — a 7-link × 16-bucket chain resolve ran 112 near-empty tasks
    * where 7 suffice. The target tracks real bytes, so a 100 TB chain
    * keeps its full scan parallelism (guide §2.2/§6: fewer, larger
    * tasks; small files are the enemy).
    */
  private def readBucketTriples(
      spark: SparkSession,
      tablePath: String,
      triples: Seq[(String, Int, Long)]): Option[DataFrame] = {
    if (triples.isEmpty) None
    else {
      if (genSchemaCache.size > 4096) genSchemaCache.clear()
      val union = triples.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1).map {
        case ((gen, pos), grp) =>
          val genDir = Paths.get(tablePath, gen)
          val paths = grp.map(_._3).sorted
            .map(b => s"$tablePath/$gen/__bucket=$b")
          def rd = spark.read.option("basePath", s"$tablePath/$gen")
          val schema = genSchemaCache.computeIfAbsent(
            (genDir.toString, Files.getLastModifiedTime(genDir)),
            _ => rd.parquet(paths: _*).schema)
          val bytes = paths.iterator.map { p =>
            val s = Files.list(Paths.get(p))
            try {
              import scala.jdk.CollectionConverters._
              s.iterator().asScala
                .filter(_.getFileName.toString.endsWith(".parquet"))
                .map(Files.size).sum
            } finally s.close()
          }.sum
          val targetParts = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
          rd.schema(schema).parquet(paths: _*)
            .coalesce(targetParts)
            .withColumn("__bucket", col("__bucket").cast("long"))
            .withColumn("__seq", lit(pos.toLong))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
      // COLUMN-ORDER CONTRACT (the r18→r19 GraftFormatSpec flake's root
      // cause): the unionByName output order follows the FIRST scan's
      // schema, and the sort key above is the generation NAME — a
      // random uuid. A generation whose writer carried a different
      // column order (a delete's widened tombstone frame leads with
      // key+order columns) therefore flips the resolved read's schema
      // order whenever its uuid wins the sort — and a catalog
      // registration then records the flipped order, silently
      // cross-binding every positional consumer (INSERT INTO ... SELECT
      // mapped 0 → ts). Normalize: stored-schema columns first in their
      // stored order, anything else (engine scratch, columns a pinned
      // old manifest carries) after, in union order. A pure projection —
      // Catalyst collapses it into the scan, zero execution cost.
      val lead = storedSchema(tablePath).toSeq.flatMap { s =>
        val resolver = spark.sessionState.conf.resolver
        s.fieldNames.toSeq.flatMap(n => union.columns.find(resolver(_, n)))
      }
      // backtick-quoted references: a bare col(name) parses dots as
      // nested-field access, breaking the read of any table with a
      // literal dotted column name
      def quoted(name: String): org.apache.spark.sql.Column =
        col("`" + name.replace("`", "``") + "`")
      Some(if (lead.isEmpty) union
      else {
        val rest = union.columns.filterNot(lead.contains)
        union.select((lead ++ rest).map(quoted).toIndexedSeq: _*)
      })
    }
  }

  /** LWW-resolve a chain read: one row per key, ranked by `order` then
    * chain recency (`__seq` — a later delta beats an earlier one on
    * order-ties, the read-time equivalent of [[mergeLww]]'s batch-beats-
    * existing tag). Single-chain tables skip the window entirely — a
    * fully-compacted or merge-on-write table resolves for free.
    */
  private def resolveChainRead(df: DataFrame, entries: Map[Long, String],
      keys: Seq[String], order: Seq[Column]): DataFrame =
    if (hasChains(entries)) latestByKey(df, keys, order :+ col("__seq")).drop("__seq")
    else df.drop("__seq")

  /** Read the atomic table at its current manifest, without the layout
    * column. Before the first commit there is no schema to offer, so the
    * zero-column `emptyDataFrame` comes back — callers that must project
    * specific columns before data exists should gate on
    * `readManifest(path).nonEmpty` (schema lives in the data files; this
    * sink stores none of its own).
    *
    * Refuses a table with unresolved delta chains: this reader has no
    * key/order spec, so it would return every superseded row version —
    * a silently-wrong table. Use [[readBucketedDelta]] (or compact
    * first) there.
    */
  def readBucketedAtomic(spark: SparkSession, tablePath: String): DataFrame = {
    val manifest = readManifest(tablePath)
    require(!hasChains(manifest),
      s"$tablePath has merge-on-read delta chains; " +
        "use readBucketedDelta(keys, order) or compactBucketChains first")
    readManifestBuckets(spark, tablePath, manifest) match {
      case Some(df) => dropTombstones(df).drop("__seq").drop("__bucket")
      case None => spark.emptyDataFrame
    }
  }

  /** Merge-on-read resolving reader: the table at `atVersion` (default:
    * the chain head), LWW-resolved per key by `order` then delta
    * recency. Works on any table of this family — on a merge-on-write
    * table (no chains) it degrades to a plain scan with NO window
    * shuffle, so it is always safe to read through this entry point.
    *
    * `atVersion` is the time-travel handle: any version still inside
    * the vacuum keep window is readable ([[tableVersions]] lists them).
    * The version pins the MANIFEST; [[vacuumGenerations]]'s grace set
    * keeps the generations those retained manifests reference.
    */
  def readBucketedDelta(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column],
      atVersion: Option[Long] = None): DataFrame = {
    val manifest = atVersion match {
      case Some(v) => manifestAt(tablePath, v)
      case None => readManifest(tablePath)
    }
    readBucketedDeltaManifest(spark, tablePath, keys, order, manifest)
  }

  /** [[readBucketedDelta]] over an EXPLICIT bucket→chain manifest — the
    * seam that makes MIXED-state reads possible: a sub-version consumer
    * (the sliced maintenance stream) sits between two versions, with
    * some buckets already applied at v+1 and the rest still at v, and
    * that state IS a manifest ([[mixedManifestAt]]) even though no
    * single committed version holds it. Same resolve as the public
    * reader; callers own the manifest's coherence (one layout).
    */
  private[graft] def readBucketedDeltaManifest(spark: SparkSession,
      tablePath: String, keys: Seq[String], order: Seq[Column],
      manifest: Map[Long, String]): DataFrame = {
    requireSpecMatches(spark, tablePath, keys, order)
    readManifestBuckets(spark, tablePath, manifest) match {
      case Some(df) =>
        dropTombstones(resolveChainRead(df, manifest, keys, order))
          .drop("__bucket")
      case None => spark.emptyDataFrame
    }
  }

  /** The bucket→chain manifest of the MIXED state `(v, applied)`:
    * versions `<= v` fully applied PLUS the `applied` buckets of version
    * `v + 1` — the state a sub-version slice consumer's store reflects
    * mid-version. Buckets in `applied` take v+1's chain (including
    * buckets v+1 created); everything else keeps v's. Defined only
    * within one layout — a slice never spans a rebucket (the feed
    * construction invariant), and this guards it anyway.
    */
  private[graft] def mixedManifestAt(tablePath: String, v: Long,
      applied: Set[Long]): Map[Long, String] = {
    val (manBase, metaBase) = manifestAndMetaAt(tablePath, v)
    val (manStep, metaStep) = manifestAndMetaAt(tablePath, v + 1)
    require(metaBase.get("numBuckets") == metaStep.get("numBuckets"),
      s"$tablePath: a mixed (sub-version) state cannot span the layout " +
        s"change at v${v + 1} — bucket ids are incomparable across it")
    manBase.filterNot { case (b, _) => applied(b) } ++
      manStep.filter { case (b, _) => applied(b) }
  }

  /** [[readBucketedDelta]] under the table's own STORED key/order spec
    * ([[storedSpec]]) — the self-describing read: no per-call spec to
    * mistype. Loud when the table carries no spec metadata.
    */
  def readBucketedDelta(spark: SparkSession, tablePath: String): DataFrame =
    readBucketedDelta(spark, tablePath, None)

  def readBucketedDelta(spark: SparkSession, tablePath: String,
      atVersion: Option[Long]): DataFrame = {
    val (keys, order) = mustStoredSpec(tablePath)
    readBucketedDelta(spark, tablePath, keys, order, atVersion)
  }

  /** NULL-SAFE distributed semi-join of `left` to `right` on `cols`
    * (right side deduplicated and renamed so the output carries only
    * left columns). Null key/dim values are legal rows everywhere in
    * this family — a plain equi-join would silently drop them.
    */
  private def semiJoinNullSafe(left: DataFrame, right: DataFrame,
      cols: Seq[String], hintBroadcast: Boolean = false,
      dedupRight: Boolean = true): DataFrame = {
    val base = if (dedupRight) right.select(cols.map(col): _*).distinct()
      else right.select(cols.map(col): _*)
    val r0 = cols.foldLeft(base)(
      (df, c) => df.withColumnRenamed(c, "__sj_" + c))
    // the hint is for callers who have VERIFIED the right side is small
    // (a counted key set): AQE's size estimate for a distinct's shuffle
    // output sits near the 10 MB threshold already at ~400k long keys,
    // and a mis-planned sort-merge here shuffles the whole LEFT table
    // (measured: 248 MB vs ~0 at the ×100 probe)
    val r = if (hintBroadcast) broadcast(r0) else r0
    val cond = cols.map(c => col(c) <=> col("__sj_" + c)).reduce(_ && _)
    left.join(r, cond, "left_semi")
  }

  /** Hard cap for [[readBucketedDeltaMatching]]'s self-verified
    * broadcast: 1M keys ≈ single-digit MB serialized for numeric keys,
    * safely inside executor/driver broadcast budgets even for wide
    * string keys. Above it the planner decides (worst case ≈ 1.3× the
    * plain full window — a slope, never a cliff).
    */
  private[graft] val MaxBroadcastCandidateKeys: Long = 1000000L

  /** Resolved image (at `atVersion`, default head) of every key that has
    * ANY version-row whose `matchCols` values null-safe-match a row of
    * `matchDf` — the KEY-BOUNDED recompute read. On a chained
    * (merge-on-read) table, [[readBucketedDelta]] + a post-resolve
    * filter pays the LWW window over the WHOLE table before the filter
    * can prune (measured: ~220 MB shuffled on a 10M-row base for one
    * dirty-extremum recompute); this entry point instead derives the
    * candidate keys map-side (scan + broadcastable semi-join against
    * `matchDf`), semi-joins the table's rows down to those keys, and
    * windows only the survivors — the shuffle is bounded by the
    * matching keys' rows, never the table. Fully distributed: no
    * driver-side key collection, so `matchDf` may be arbitrarily large
    * (unlike [[lookupBucketed]]'s point-read contract).
    *
    * The result is a SUPERSET image by design: a key whose OLD version
    * matched but whose resolved row no longer does is still returned
    * (at its resolved values) — callers re-filter on the resolved rows
    * (cheap, they are already key-unique).
    */
  /** `broadcastKeys = true` asks for a broadcast of the derived
    * candidate-key set, SELF-VERIFIED: the key set is counted first and
    * the hint applies only at or below [[MaxBroadcastCandidateKeys]] —
    * a caller's estimate can undercount by table-scale (e.g. the view
    * routes on LIVE per-group counts, but candidates include keys whose
    * SUPERSEDED versions matched: a churn-heavy group with 100 live
    * keys can have millions of candidates), and an unconditional
    * broadcast there is a driver-memory cliff. The count costs one
    * extra pass over the candidate derivation (scan-side, no new
    * shuffle) — paid only on this opt-in path. Without the hint AQE's
    * own estimate tips to sort-merge near ~400k keys and shuffles the
    * whole table (measured 248 MB vs ~0 at the ×100 probe); with
    * false, the planner always decides (safe at any size).
    */
  def readBucketedDeltaMatching(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], matchDf: DataFrame,
      matchCols: Seq[String], atVersion: Option[Long] = None,
      broadcastKeys: Boolean = false): DataFrame = {
    val manifest = atVersion match {
      case Some(v) => manifestAt(tablePath, v)
      case None => readManifest(tablePath)
    }
    readBucketedDeltaMatchingManifest(spark, tablePath, keys, order,
      matchDf, matchCols, manifest, broadcastKeys)
  }

  /** [[readBucketedDeltaMatching]] over an explicit manifest — the
    * key-bounded twin of [[readBucketedDeltaManifest]], for the same
    * mixed-state consumers.
    */
  private[graft] def readBucketedDeltaMatchingManifest(spark: SparkSession,
      tablePath: String, keys: Seq[String], order: Seq[Column],
      matchDf: DataFrame, matchCols: Seq[String],
      manifest: Map[Long, String], broadcastKeys: Boolean): DataFrame = {
    requireSpecMatches(spark, tablePath, keys, order)
    readManifestBuckets(spark, tablePath, manifest) match {
      case None => spark.emptyDataFrame
      case Some(all) =>
        val wantedKeys = semiJoinNullSafe(all, matchDf, matchCols)
          .select(keys.map(col): _*).distinct()
        val hint = broadcastKeys &&
          wantedKeys.limit((MaxBroadcastCandidateKeys + 1).toInt).count() <=
            MaxBroadcastCandidateKeys
        // wantedKeys is already distinct — skip the helper's dedup
        dropTombstones(resolveChainRead(
          semiJoinNullSafe(all, wantedKeys, keys, hintBroadcast = hint,
            dedupRight = false),
          manifest, keys, order)).drop("__bucket")
    }
  }

  /** Hard bound on [[lookupBucketed]]'s request set: the keys are
    * collected to the driver for bucket pruning, so the API is a POINT
    * lookup by contract. 100k keys × a few hundred bytes ≈ tens of MB —
    * comfortable on any driver; beyond it the caller wants a
    * distributed join, not pruning.
    */
  val MaxLookupKeys: Int = 100000

  /** Bound on the per-key-column literal list [[lookupBucketed]] pushes
    * below the LWW window (catalyst In → parquet row-group skipping).
    * Past it the filter chain costs more than it saves; the lookup then
    * relies on bucket pruning + the semi-join alone.
    */
  private[graft] val MaxPushdownLiterals: Int = 1000

  /** Bucket-pruned point lookup: resolve ONLY the buckets the requested
    * keys hash to — at 100 TB a point read must touch O(requested keys)
    * bucket directories, never scan the table. `keyDf` carries exactly
    * the key columns (one row per requested key tuple); the bucket count
    * comes from the table's layout record (manifest metadata after a
    * [[rebucketTable]], else the `_layout` sidecar), so the reader
    * cannot hash with a different function than the writer did. Works
    * on chained (merge-on-read) and plain manifest tables alike;
    * `atVersion` makes it a historical point read.
    *
    * Driver-side metadata: one collect of the requested keys' distinct
    * buckets — bounded by [[MaxLookupKeys]] with a loud refusal above
    * it (a bulk subset read belongs on readBucketedDelta + a
    * distributed join, where pruning would not help anyway).
    */
  def lookupBucketed(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], keyDf: DataFrame,
      atVersion: Option[Long] = None): DataFrame = {
    requireSpecMatches(spark, tablePath, keys, order)
    // hash with the layout IN FORCE AT THE READ VERSION — and resolve
    // layout and manifest from ONE head/version snapshot: reading them
    // in two separate listings lets a rebucket commit in between, and a
    // lookup hashing with the old count against the new layout's
    // manifest prunes to the WRONG buckets (silently incomplete result)
    val (fullManifest, nbOpt) = atVersion match {
      case Some(v) => (manifestAt(tablePath, v),
        metaAt(tablePath, v).get("numBuckets").map(_.toInt)
          .orElse(readLayout(tablePath)))
      case None =>
        val (_, man, meta) = versionedHeadFull(tablePath)
        (man, meta.get("numBuckets").map(_.toInt).orElse(readLayout(tablePath)))
    }
    val nb = nbOpt.getOrElse(throw new IllegalStateException(
      s"$tablePath has no _layout sidecar (recorded at the first commit " +
        "since round 15) — a point lookup must hash with the writer's " +
        "bucket count; run one commit to adopt the sidecar, or read via " +
        "readBucketedDelta"))
    val resolver = keyDf.sparkSession.sessionState.conf.resolver
    require(keys.forall(k => keyDf.columns.exists(resolver(_, k))),
      s"keyDf must carry the key column(s) ${keys.mkString(", ")} " +
        s"(has: ${keyDf.columns.mkString(", ")})")
    // materialize the request set ONCE — deriving `buckets` from one
    // execution and the semi-join from a re-execution would let a
    // non-deterministic keyDf (sample, unordered limit) hash a key into
    // a bucket the pruning already dropped: a silently incomplete
    // result. The collect is bounded by CONTRACT, and the contract is
    // enforced: this is a POINT-lookup API (the request set lives on
    // the driver), and a caller treating it as a bulk subset read would
    // otherwise discover the driver-memory wall as an opaque OOM. Above
    // the bound, read the table through readBucketedDelta and join the
    // request set distributed — at millions of keys most buckets are
    // touched anyway, so bucket pruning has nothing left to save.
    val keyed = keyDf.select(keys.map(col): _*).distinct()
      .withColumn("__bucket", bucketOf(keys, nb))
    val keyRows = keyed.limit(MaxLookupKeys + 1).collect().toIndexedSeq
    require(keyRows.size <= MaxLookupKeys,
      s"lookupBucketed request set exceeds $MaxLookupKeys distinct keys — " +
        "this is a point-lookup API whose request set is collected to " +
        "the driver for bucket pruning; for bulk subset reads join the " +
        "key set against readBucketedDelta (distributed, no pruning " +
        "needed at that selectivity)")
    val buckets = keyRows.map(r => r.getLong(r.length - 1)).toSet // last field = __bucket
    val requestDf = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(keyRows).asJava), keyed.schema)
      .drop("__bucket")
    val manifest = fullManifest.filter { case (b, _) => buckets.contains(b) }
    // requested-key predicate pushed BELOW the LWW window: filtering by
    // KEY columns there is safe (all of a key's version-rows satisfy or
    // fail it together — the same key-level argument as bucket pruning),
    // and it reaches the parquet scan as pushed In filters, so row-group
    // statistics skip the bucket's OTHER keys' data instead of decoding
    // the whole bucket through the window sort. Per-column value sets
    // are a superset of the requested tuples on compound keys — the
    // semi-join below stays the exact gate. Null request values drop out
    // (the equality semi-join never matches them anyway). Bounded: past
    // [[MaxPushdownLiterals]] a literal chain costs more than it saves
    // and the bucket-pruned scan alone is the predictable plan.
    val keyValueSets = keys.indices.map(i =>
      keyRows.map(_.get(i)).filter(_ != null).distinct)
    val keyPred: Option[Column] =
      if (keyRows.isEmpty ||
          keyValueSets.exists(_.size > MaxPushdownLiterals)) None
      else Some(keys.zip(keyValueSets).map { case (k, vs) =>
        col(k).isin(vs: _*)
      }.reduce(_ && _))
    def resolved(man: Map[Long, String]): Option[DataFrame] =
      readManifestBuckets(spark, tablePath, man)
        .map { full =>
          val df = keyPred.fold(full)(full.filter)
          dropTombstones(resolveChainRead(df, man, keys, order))
            .join(broadcast(requestDf), keys, "left_semi").drop("__bucket")
        }
    resolved(manifest).orElse {
      // every requested key hashed to an unpopulated bucket: still
      // return the TABLE's schema (footer-only read of the full
      // manifest, limit 0 — no data scanned), so a caller's
      // select/write behaves the same whatever the keys hash to
      resolved(fullManifest).map(_.limit(0))
    }.getOrElse(spark.emptyDataFrame) // table has no data at all
  }

  /** [[lookupBucketed]] under the table's own STORED key/order spec —
    * loud when the table carries no spec metadata.
    */
  def lookupBucketed(spark: SparkSession, tablePath: String,
      keyDf: DataFrame): DataFrame =
    lookupBucketed(spark, tablePath, keyDf, None)

  def lookupBucketed(spark: SparkSession, tablePath: String,
      keyDf: DataFrame, atVersion: Option[Long]): DataFrame = {
    val (keys, order) = mustStoredSpec(tablePath)
    lookupBucketed(spark, tablePath, keys, order, keyDf, atVersion)
  }

  /** Event-sourced DELETE on the versioned keyed table: commits one
    * generation of TOMBSTONE rows through the exact optimistic chain
    * protocol as [[upsertBucketedDelta]] (same layout/spec handshakes,
    * same replay semantics, None on an empty batch). Each delete row
    * carries the key and ORDER columns and competes in the LWW rank
    * like any version-row:
    *
    *  - a tombstone ordered above a key's rows deletes it — the key is
    *    ABSENT from every resolved read at-or-after this commit (point
    *    lookups, facades, matching reads; time travel BELOW the
    *    delete's version still serves the key);
    *  - a LATER upsert ordered above the tombstone re-creates the key;
    *  - a replayed OLDER event still loses — replay determinism is
    *    exactly the upsert path's (this is why deletes are
    *    order-ranked, not unconditional: an unconditional delete would
    *    make the table's state depend on delivery order).
    *
    * Value columns ride as typed nulls under the committed schema
    * contract (a delete never evolves it). Tombstone rows persist
    * through compaction folds and rebuckets — dropping a winning
    * tombstone would let a replayed older event resurrect the key; the
    * retention horizon for ever dropping them is the operator's replay
    * window, the same judgment [[adviseRetention]] informs. The
    * WEIGHTED change feed carries a deletion as the bare `__weight=-1`
    * last image (consumers like [[MaterializedAggView]] already fold
    * retractions); the PLAIN upsert feed cannot represent it, so plain
    * feeds refuse tombstoned ranges loudly via [[TombstoneMeta]].
    */
  def deleteBucketedDelta(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      numBuckets: Int = 64,
      maxAttempts: Int = 20,
      compactAfter: Int = 8,
      extraMeta: Map[String, String] = Map.empty,
      abortIf: Map[String, String] => Boolean = _ => false)(
      delRows: DataFrame, batchId: Long): Option[OptimisticCommit] = {
    requireKeyOrderCols(delRows, keys, order)
    val resolver = spark.sessionState.conf.resolver
    val carry = (keys ++ orderColNames(spark, order)).distinct
    // one tombstone per (key, order) tuple — duplicates add nothing and
    // the intra-batch compaction would fold them anyway
    val base = delRows.select(carry.map(col): _*).distinct()
    val contract = storedSchema(tablePath)
      .orElse(Option(readBucketedDelta(spark, tablePath, keys, order).schema)
        .filter(_.nonEmpty))
      .getOrElse(throw new IllegalStateException(
        s"$tablePath has no committed schema to delete against — " +
          "deleteBucketedDelta targets an existing versioned table"))
    val widened = contract.fields.foldLeft(base)((df, f) =>
      if (carry.exists(resolver(_, f.name))) df
      else df.withColumn(f.name, lit(null).cast(f.dataType)))
    upsertBucketedDelta(spark, tablePath, keys, order, numBuckets,
      maxAttempts, compactAfter,
      extraMeta = extraMeta,
      abortIf = abortIf,
      // record the version THIS delete lands at (re-evaluated per CAS
      // retry): the latest delete overwrites, so feeds can refuse with
      // version granularity — a plain range STARTING at-or-after the
      // last delete is provably complete and keeps working
      extraMetaAt = v => Map(TombstoneMeta -> v.toString))(
      widened.withColumn(TombstoneCol, lit(true)), batchId)
  }

  /** [[deleteBucketedDelta]] under the table's own STORED key/order
    * spec — loud when the table carries no spec metadata.
    */
  def deleteBucketedDelta(spark: SparkSession, tablePath: String,
      numBuckets: Int)(
      delRows: DataFrame, batchId: Long): Option[OptimisticCommit] = {
    val (keys, order) = mustStoredSpec(tablePath)
    deleteBucketedDelta(spark, tablePath, keys, order, numBuckets)(
      delRows, batchId)
  }

  /** Predicate-driven delete — `DELETE FROM t WHERE p` for the keyed
    * table. Until now a delete required the caller to already KNOW the
    * (key, order) tuples ([[deleteBucketedDelta]]); the common real
    * delete is by predicate ("purge user X", "drop docs below quality
    * t"). This verb composes the two existing primitives: pin ONE
    * snapshot version, resolve it, filter the LIVE rows by `predicate`
    * (SQL semantics — a NULL predicate does not match), project the
    * matched (key, order) tuples, and commit them as tombstones through
    * [[deleteBucketedDelta]]. Matching nothing commits nothing (the
    * committer's own empty-batch no-op), so a miss never burns a
    * version.
    *
    * RANKING: each tombstone carries its matched image's OWN order
    * values — the weighted-mirror precedent, not the caller-invented
    * above-everything order. Consequences, all flowing from the one
    * LWW rule (`order`, ties → chain recency):
    *  - every version-row at-or-below the matched image loses to the
    *    tombstone (it committed later, so it wins the order-tie and
    *    everything under it) — a replayed STRICTLY-OLDER event cannot
    *    resurrect the key;
    *  - a row with order ABOVE the image — whether it committed before
    *    this verb ran (see the race note) or after — outranks the
    *    tombstone: the normal LWW re-insert door stays open;
    *  - the one sharp edge: an EXACT duplicate of the deleted image
    *    (same order values) committed AFTER the delete wins the
    *    order-tie by recency and resurrects the key. Exactly-once
    *    upstream feeds never do this (the stream sink's high-water
    *    absorbs engine replays); an at-least-once feed that can
    *    redeliver the tombstoned image itself should delete at an
    *    above-everything order via [[deleteBucketedDelta]] directly.
    *
    * RACE CONTRACT (snapshot-vs-commit window): the predicate evaluates
    * against the pinned snapshot, and commits landing between the pin
    * and this delete's CAS commit are NOT re-matched — a key whose
    * matching image arrives in that window survives this call (run the
    * verb again; it matches the new head). The converse is safe by
    * ranking: a concurrent upsert ABOVE a matched image outranks its
    * tombstone, so this verb can never delete data newer than what it
    * matched. The optimistic committer retries the CAS on manifest
    * races as usual — retries re-stage the SAME tombstone set (the
    * decision stays snapshot-coherent; it never silently re-matches).
    *
    * Cost shape at 100 TB: one resolved scan of the snapshot under the
    * predicate (Catalyst prunes columns to keys ++ order ++ predicate
    * refs through the resolve's window), then the delete commit touches
    * only the buckets the matched keys hash to. Returns the commit
    * (None when nothing matched).
    */
  def deleteWhere(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      predicate: Column,
      numBuckets: Int = 64,
      maxAttempts: Int = 20,
      compactAfter: Int = 8,
      extraMeta: Map[String, String] = Map.empty): Option[OptimisticCommit] = {
    // pin the snapshot ONCE: the predicate must see one coherent table
    // state, never a per-bucket mix with a concurrent commit
    val pinned = tableVersions(tablePath).lastOption
    val matched = readBucketedDelta(spark, tablePath, keys, order,
      atVersion = pinned).filter(predicate)
    deleteBucketedDelta(spark, tablePath, keys, order, numBuckets,
      maxAttempts, compactAfter, extraMeta)(matched, 0L)
  }

  /** [[deleteWhere]] under the table's own STORED key/order spec —
    * loud when the table carries no spec metadata.
    */
  def deleteWhere(spark: SparkSession, tablePath: String,
      predicate: Column, numBuckets: Int): Option[OptimisticCommit] = {
    val (keys, order) = mustStoredSpec(tablePath)
    deleteWhere(spark, tablePath, keys, order, predicate, numBuckets)
  }

  /** Predicate-driven update — `UPDATE t SET ... WHERE p` for the keyed
    * table, completing the predicate-verb family [[deleteWhere]]
    * opened: pin ONE snapshot version, resolve it, filter the LIVE rows
    * by `predicate` (SQL semantics — NULL does not match), apply the
    * `set` expressions (evaluated against the MATCHED image, so
    * `"n" -> col("n") + 1` works), and commit the rewritten images as
    * one upsert. Matching nothing commits nothing.
    *
    * RANKING — the [[deleteWhere]] contract verbatim: the updated image
    * carries its source image's OWN order values, so it wins the
    * order-tie against every at-or-below version-row by chain recency,
    * a strictly-older replay cannot revert it, a LATER upsert outranks
    * it normally, and the one sharp edge is an exact-duplicate replay
    * of the OLD image committed after the update (ties, wins by
    * recency, reverts) — exactly-once feeds never do this.
    *
    * `set` columns are restricted to VALUE columns, refused loudly
    * otherwise: updating a KEY column rewrites row identity (that is a
    * delete + insert — do both explicitly, each with its own rank),
    * and updating an ORDER column can lower the new image's own rank
    * below its source, making the update silently invisible (commit a
    * new event through the normal upsert door instead — its order IS
    * its rank). Same snapshot-vs-commit race window as [[deleteWhere]]:
    * commits landing between the pin and this commit are not
    * re-matched; re-run to catch them.
    *
    * Cost shape at 100 TB: one resolved scan under the predicate, then
    * an upsert commit touching only the matched keys' buckets.
    */
  def updateWhere(
      spark: SparkSession,
      tablePath: String,
      keys: Seq[String],
      order: Seq[Column],
      predicate: Column,
      set: Map[String, Column],
      numBuckets: Int = 64,
      maxAttempts: Int = 20,
      compactAfter: Int = 8,
      extraMeta: Map[String, String] = Map.empty): Option[OptimisticCommit] = {
    require(set.nonEmpty, "updateWhere: empty SET — nothing to update")
    val resolver = spark.sessionState.conf.resolver
    // two SET keys resolving to the SAME column (case variants under
    // the default case-insensitive resolver) would silently apply one
    // and drop the other in the per-field lookup below — a
    // contradiction, refused here like the SQL door refuses verbatim
    // duplicates
    val setKeys = set.keys.toSeq
    setKeys.combinations(2).foreach { case Seq(a, b) =>
      require(!resolver(a, b),
        s"updateWhere: SET assigns '$a' and '$b', which resolve to the " +
          "same column — one assignment per column")
    }
    val orderNames = orderColNames(spark, order)
    set.keys.foreach { c =>
      require(!keys.exists(resolver(_, c)),
        s"updateWhere: SET on key column '$c' rewrites row identity — " +
          "delete the old key and upsert the new one explicitly, each " +
          "with its own rank")
      require(!orderNames.exists(resolver(_, c)),
        s"updateWhere: SET on order column '$c' can lower the new " +
          "image's own LWW rank below its source and never become " +
          "visible — commit a new event through the upsert door " +
          "instead (its order is its rank)")
    }
    val pinned = tableVersions(tablePath).lastOption
    val matched = readBucketedDelta(spark, tablePath, keys, order,
      atVersion = pinned).filter(predicate)
    // SIMULTANEOUS application — SQL UPDATE semantics: every SET
    // expression evaluates against the MATCHED image, never against
    // another assignment's output (a sequential withColumn fold would
    // make `SET a = b, b = a` read the already-rewritten a). One
    // select over all columns does exactly that.
    // backtick-quoted references for untouched columns: a bare
    // col(name) parses dots as nested-field access, so a table with a
    // literal "price.usd" column would fail analysis even when the SET
    // targets a different column
    def quoted(name: String): Column =
      col("`" + name.replace("`", "``") + "`")
    val rewritten = matched.select(matched.schema.fields.map { f =>
      set.find { case (c, _) => resolver(f.name, c) } match {
        case Some((_, e)) =>
          // preserve the column's declared type, LOUDLY: a silent cast
          // can null-coerce a type-incompatible expression under
          // non-ANSI configs (string → long) and commit NULLs over
          // every matched row — refuse anything but a same-type or
          // lossless up-cast instead
          val eType = matched.select(e.as("__uw_t")).schema.head.dataType
          require(org.apache.spark.sql.types.DataType
              .equalsStructurally(eType, f.dataType, ignoreNullability = true) ||
              org.apache.spark.sql.catalyst.expressions.Cast
                .canUpCast(eType, f.dataType),
            s"updateWhere: SET expression for '${f.name}' has type " +
              s"${eType.simpleString}, not assignable to the column's " +
              s"${f.dataType.simpleString} — a silent cast could " +
              "null-coerce and rewrite matched rows to NULL; cast " +
              "explicitly in the expression if the narrowing is meant")
          e.cast(f.dataType).as(f.name)
        case None => quoted(f.name)
      }
    }.toIndexedSeq: _*)
    // every SET name must have landed on exactly one schema column
    set.keys.foreach { c =>
      require(matched.schema.fields.exists(f => resolver(f.name, c)),
        s"updateWhere: SET column '$c' is not a column of the table")
    }
    upsertBucketedDelta(spark, tablePath, keys, order, numBuckets,
      maxAttempts, compactAfter, extraMeta = extraMeta)(rewritten, 0L)
  }

  /** [[updateWhere]] under the table's own STORED key/order spec —
    * loud when the table carries no spec metadata.
    */
  def updateWhere(spark: SparkSession, tablePath: String,
      predicate: Column, set: Map[String, Column],
      numBuckets: Int): Option[OptimisticCommit] = {
    val (keys, order) = mustStoredSpec(tablePath)
    updateWhere(spark, tablePath, keys, order, predicate, set, numBuckets)
  }

  /** Upsert change feed between two committed versions: every row of the
    * resolved table at `toVersion` (default: head) that is not present
    * identically in the resolved table at `fromVersion` — i.e. the keys
    * inserted or updated in between, at their `toVersion` values. On a
    * table WITHOUT deletes the upsert-only feed is the complete
    * change-data capture; a table that has committed tombstones refuses
    * the plain feed (a deletion has no representation here — use
    * [[readChangesWeighted]]). Downstream incremental consumers (the
    * "process only documents ingested since the last training run"
    * pattern) read the feed instead of diffing 100 TB.
    *
    * Cost shape: only buckets whose manifest CHAIN ENTRY differs between
    * the two versions are read (both sides), never the whole table — an
    * untouched bucket contributes nothing and is provably never scanned.
    * A compaction between the versions changes a chain entry without
    * changing data; the row-level diff then correctly reports nothing
    * for it. Both versions must still be inside the vacuum keep window,
    * and `fromVersion`'s generations inside the reader grace set — the
    * same retention contract as time travel.
    */
  def readChangesBetween(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame =
    changesBetweenImpl(spark, tablePath, keys, order, fromVersion,
      toVersion, weighted = false)

  /** [[readChangesBetween]] under the table's own STORED key/order spec
    * — loud when the table carries no spec metadata.
    */
  def readChangesBetween(spark: SparkSession, tablePath: String,
      fromVersion: Long): DataFrame =
    readChangesBetween(spark, tablePath, fromVersion, None)

  def readChangesBetween(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Option[Long]): DataFrame = {
    val (keys, order) = mustStoredSpec(tablePath)
    readChangesBetween(spark, tablePath, keys, order, fromVersion, toVersion)
  }

  /** Weighted change feed between two committed versions: every row of
    * the [[readChangesBetween]] upsert feed carries `__weight` = +1, and
    * the superseded `fromVersion` image of each UPDATED key carries
    * `__weight` = -1 — the retraction stream. A consumer maintaining a
    * distributive aggregate (SUM / COUNT — anything where a row's
    * contribution adds) applies one delta pass,
    * `agg(expr * __weight)`, and never touches the base table: the -1
    * rows subtract exactly what the key's old image contributed, the
    * +1 rows add the new image ([[MaterializedAggView]] is the built-in
    * consumer). Freshly inserted keys have no -1 row; a key DELETED in
    * the range ([[deleteBucketedDelta]]) is the bare -1 of its last
    * live image with no matching +1 — a retraction a distributive
    * consumer folds like any other (this is the only feed that can
    * represent deletes; the plain feed refuses tombstoned ranges).
    *
    * Same touched-bucket cost shape and vacuum/retention contract as
    * [[readChangesBetween]]; the symmetric difference is computed only
    * over buckets whose manifest chain entry changed.
    */
  def readChangesWeighted(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame =
    changesBetweenImpl(spark, tablePath, keys, order, fromVersion,
      toVersion, weighted = true)

  /** [[readChangesWeighted]] under the table's own STORED key/order
    * spec — loud when the table carries no spec metadata.
    */
  def readChangesWeighted(spark: SparkSession, tablePath: String,
      fromVersion: Long): DataFrame =
    readChangesWeighted(spark, tablePath, fromVersion, None)

  def readChangesWeighted(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Option[Long]): DataFrame = {
    val (keys, order) = mustStoredSpec(tablePath)
    readChangesWeighted(spark, tablePath, keys, order, fromVersion, toVersion)
  }

  /** Test/telemetry seam: which implementation served a change-feed
    * read — "append" (chain-suffix fast path: batch-scale shuffles
    * only) or "diff" (full symmetric difference over the touched
    * buckets). Invoked once per non-idle feed read.
    */
  private[graft] var onChangesPath: String => Unit = _ => ()

  /** The change feed's append fast path: with every touched bucket's
    * from-chain a prefix of its to-chain, the changed keys are exactly
    * those in the appended generations. `appended` carries the suffix
    * rows at their true to-chain `__seq` positions; the before-image
    * rows of those keys join in (null-safe — LWW groups null keys) and
    * both sides resolve with the SAME `order :+ __seq` rank as
    * [[resolveChainRead]] (from-prefix positions sit strictly below the
    * suffix positions per bucket, so recency ties break identically).
    * The feed is then the batch-scale symmetric difference of the two
    * images — bit-identical to the full-diff path by construction,
    * without its table-scale window + except shuffles.
    */
  private def appendFeed(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], before: Map[Long, String],
      appended: DataFrame, weighted: Boolean): DataFrame = {
    val oldSemi = readManifestBuckets(spark, tablePath, before)
      .map(oldRows => semiJoinNullSafe(oldRows, appended, keys))
    def img(df: DataFrame): DataFrame =
      // a winning tombstone makes its key ABSENT from the image, so the
      // symmetric difference below reports a delete as the weighted
      // feed's bare -1 (old image, no +1) — same shape as the full diff
      dropTombstones(latestByKey(df, keys, order :+ col("__seq")))
        .drop("__seq").drop("__bucket")
    oldSemi match {
      case None => // touched buckets had no before image: inserts only
        val ins = img(appended)
        if (weighted) ins.withColumn("__weight", lit(1L)) else ins
      case Some(o) =>
        // align to the union schema (schema evolution can differ the
        // two sides) with the before image as the left frame both
        // times, so column order matches
        val newImg = img(o.unionByName(appended, allowMissingColumns = true))
        val oldImg = img(o.unionByName(appended.limit(0),
          allowMissingColumns = true))
          .select(newImg.columns.map(col).toIndexedSeq: _*)
        // one row per key on both sides, so except's set semantics
        // can't collapse distinct keys; an identical redelivered row
        // nets nothing — same contract as the full diff
        val plus = newImg.except(oldImg)
        if (!weighted) plus
        else plus.withColumn("__weight", lit(1L))
          .unionByName(oldImg.except(newImg).withColumn("__weight", lit(-1L)))
    }
  }

  /** Sorted bucket ids whose manifest entry changed from version `v-1`
    * to `v` — the per-version work list sub-version admission control
    * slices. None when a layout change (rebucket) makes bucket ids
    * incomparable across the step: that version cannot split by bucket
    * and must drain as one batch.
    */
  private[graft] def touchedBucketsAt(tablePath: String,
      v: Long): Option[Seq[Long]] = {
    // ONE listing + one read per version (not four): this sits on the
    // streaming source's admission-control walk, which probes many
    // versions per trigger during catch-up
    val (manBefore, metaBefore) = manifestAndMetaAt(tablePath, v - 1)
    val (manNow, metaNow) = manifestAndMetaAt(tablePath, v)
    if (metaBefore.get("numBuckets") != metaNow.get("numBuckets")) None
    else Some((manNow.collect {
      case (b, g) if !manBefore.get(b).contains(g) => b
    } ++
      // a bucket REMOVED from the manifest (a purge emptied it) is
      // touched too: its before-image rows disappeared, and skipping it
      // would silently drop the range's retractions
      manBefore.keysIterator.filterNot(manNow.contains))
      .toSeq.distinct.sorted)
  }

  /** Manifest + metadata of one version from ONE listing and ONE file
    * read. Same loud-on-pruned contract as [[manifestAt]].
    */
  private def manifestAndMetaAt(tablePath: String,
      version: Long): (Map[Long, String], Map[String, String]) =
    if (version == 0L) (legacyManifest(tablePath), Map.empty)
    else versionFiles(Paths.get(tablePath)).find(_._1 == version) match {
      case Some((_, p)) =>
        import scala.jdk.CollectionConverters._
        val lines = Files.readAllLines(p).asScala.toSeq
        (parseManifestLines(lines), parseMetaLines(lines))
      case None => throw new NoSuchElementException(
        s"$tablePath: no readable manifest v$version — pruned past the " +
          s"vacuum keep window or never committed (have: " +
          s"${tableVersions(tablePath).mkString(",")})")
    }

  /** One version step's change feed restricted to a bucket subset — the
    * sub-version micro-batch of the `graft-changes` source. Buckets
    * partition keys (within one layout), so the union of disjoint
    * slices over `touchedBucketsAt(v)` equals the whole (v-1, v] feed.
    */
  private[graft] def readChangesSlice(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], version: Long,
      buckets: Set[Long], weighted: Boolean): DataFrame =
    changesBetweenImpl(spark, tablePath, keys, order, version - 1,
      Some(version), weighted, bucketSubset = Some(buckets))

  private def changesBetweenImpl(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], fromVersion: Long,
      toVersion: Option[Long], weighted: Boolean,
      bucketSubset: Option[Set[Long]] = None): DataFrame = {
    requireSpecMatches(spark, tablePath, keys, order)
    // ONE listing + read per endpoint (manifest and meta together) —
    // this sits on the streaming source's per-micro-batch hot path,
    // where separate manifestAt/metaAt calls doubled the directory
    // listings and manifest reads
    val (manFrom, metaFrom) = manifestAndMetaAt(tablePath, fromVersion)
    val toV = toVersion.getOrElse(versionedHead(tablePath)._1)
    // a reversed range would present REVERTED old values as "inserts or
    // updates at their to-version values" — a silently different
    // question; fail it loudly (same standard as manifestAt)
    require(toV >= fromVersion,
      s"$tablePath: readChangesBetween range is reversed — " +
        s"fromVersion=$fromVersion > toVersion=$toV")
    val (manTo, metaTo) = manifestAndMetaAt(tablePath, toV)
    // a deletion has no upsert-feed representation — a consumer of the
    // plain feed would silently keep serving deleted keys. Refuse with
    // version granularity: the metadata records the LATEST delete's
    // version, so a range STARTING at-or-after it is provably complete
    // (every tombstone ≤ from — both endpoint images already exclude
    // the deleted keys), while a range that could contain a delete
    // refuses loudly. One delete does not poison the table's plain
    // consumers forever; they resume past it.
    val lastDelete = metaTo.get(TombstoneMeta)
      .map(v => v.toLongOption.getOrElse(Long.MaxValue)) // legacy "true"
    require(weighted || lastDelete.forall(_ <= fromVersion),
      s"$tablePath carries a delete at v${lastDelete.getOrElse(-1L)} " +
        s"inside or above this range (from=v$fromVersion): the plain " +
        "upsert feed cannot represent a deletion — use " +
        "readChangesWeighted (a deleted key is the bare __weight=-1 " +
        "last image), the graft-changes source with weighted=true, or " +
        "start the plain range at-or-after the delete version")
    // a rebucket inside the range redefines what a bucket ID means: the
    // per-bucket diff below would drop any old bucket id absent from the
    // new layout's map (silently presenting its rows as inserts), so the
    // whole table diffs on BOTH sides — row-level except is layout-
    // agnostic, only the bucket-pruning shortcut is. Correct (never
    // silently wrong), at the documented table-scale cost: a rebucket IS
    // a full rewrite, and a feed spanning it pays the same scale once.
    val layoutChanged =
      metaFrom.get("numBuckets") != metaTo.get("numBuckets")
    // a bucket SUBSET is only meaningful within one layout — callers
    // ([[readChangesSlice]] via touchedBucketsAt) never construct one
    // across a resize, so this is a construction invariant, not a
    // user-facing contract
    require(bucketSubset.isEmpty || !layoutChanged,
      s"$tablePath: a bucket-restricted feed cannot span a layout change")
    val touchedAll =
      if (layoutChanged) manTo
      else manTo.filter { case (b, g) => !manFrom.get(b).contains(g) }
    val touched = bucketSubset.fold(touchedAll)(s =>
      touchedAll.filter { case (b, _) => s.contains(b) })
    // a bucket REMOVED from the manifest inside the range (a purge
    // emptied it) has a before-image but no to-chain: it must still
    // diff, or the feed silently drops its retractions (a weighted
    // consumer would keep the deleted keys' contribution forever)
    val removed =
      if (layoutChanged) Map.empty[Long, String]
      else bucketSubset.fold(
        manFrom.filter { case (b, _) => !manTo.contains(b) })(s =>
        manFrom.filter { case (b, _) => !manTo.contains(b) && s.contains(b) })
    val before =
      if (layoutChanged) manFrom
      else manFrom.filter { case (b, _) =>
        touched.contains(b) || removed.contains(b) }
    def resolve(man: Map[Long, String]): Option[DataFrame] =
      readManifestBuckets(spark, tablePath, man)
        .map(df => dropTombstones(resolveChainRead(df, man, keys, order))
          .drop("__bucket"))
    def weigh(df: DataFrame, w: Long): DataFrame =
      if (weighted) df.withColumn("__weight", lit(w)) else df
    // APPEND FAST PATH: when every touched bucket's from-chain is a
    // prefix of its to-chain (pure delta appends — the steady state of
    // a trickle feed; a compaction or merge-on-write commit in between
    // breaks the prefix and falls back to the full diff below), the
    // only keys whose resolved image can change are those IN the
    // appended generations: a key's LWW resolve depends solely on its
    // own rows, and the prefix rule means rows were only added. So the
    // feed derives from the appended files (batch-scale) plus ONE scan
    // of the before-image semi-joined to the appended keys — every
    // shuffle is batch-scale, where the full diff below pays two
    // table-scale window+except shuffles over the touched buckets.
    // a removed bucket is by definition NOT an append — its rows
    // disappeared — so the fast path is off whenever one exists
    val appendOnly = !layoutChanged && removed.isEmpty &&
      touched.forall { case (b, vTo) =>
        chainOf(vTo).startsWith(manFrom.get(b).map(chainOf).getOrElse(Seq.empty))
      }
    if (appendOnly && touched.nonEmpty) {
      val appendedTriples = touched.toSeq.flatMap { case (b, vTo) =>
        val pre = manFrom.get(b).map(chainOf(_).length).getOrElse(0)
        chainOf(vTo).zipWithIndex.drop(pre).map { case (g, p) => (g, p, b) }
      }
      // entry differs + prefix holds ⇒ the to-chain is strictly longer
      val appended = readBucketTriples(spark, tablePath, appendedTriples).get
      onChangesPath("append")
      return appendFeed(spark, tablePath, keys, order, before, appended,
        weighted)
    }
    if (touched.nonEmpty || removed.nonEmpty) onChangesPath("diff")
    (resolve(touched), resolve(before)) match {
      case (None, Some(from)) =>
        // every changed bucket was REMOVED (a purge emptied them): the
        // to-image is empty. The weighted feed retracts whatever the
        // before-image still resolved (live rows only — a purge of
        // already-filtered tombstones retracts nothing); the plain
        // feed has no upserts to report (the tombstone-version guard
        // above already refused any range where that would be lossy)
        if (!weighted) from.limit(0) else weigh(from, -1L)
      case (None, None) =>
        // nothing changed — the steady state a CDC poller hits on every
        // idle tick: still carry the table's schema (footer-only, limit
        // 0) so downstream select/write is version-independent
        resolve(manTo).map(df => weigh(df, 1L).limit(0))
          .getOrElse(spark.emptyDataFrame)
      // defensive only: an empty `before` makes every prefix check
      // vacuously true, so the append fast path already served this
      // shape — kept as the documented fallback invariant
      case (Some(to), None) => weigh(to, 1L)
      case (Some(to), Some(from)) =>
        // align to the UNION of columns before the set difference:
        // schema evolution can leave the two versions on different
        // column sets, and `except` demands aligned schemas. Each image
        // has one row per key (post-resolve), so `except`'s set
        // semantics can't collapse distinct keys.
        val toU = to.unionByName(from.limit(0), allowMissingColumns = true)
        val fromU = from.unionByName(to.limit(0), allowMissingColumns = true)
          .select(toU.columns.map(col).toIndexedSeq: _*)
        if (!weighted) toU.except(fromU)
        else weigh(toU.except(fromU), 1L)
          .unionByName(weigh(fromU.except(toU), -1L))
    }
  }

  /** Committed manifest versions still readable (oldest first). Version
    * numbers below the head are pruned by [[vacuumGenerations]]'s keep
    * window, so this is a sliding history, not the full log.
    */
  def tableVersions(tablePath: String): Seq[Long] =
    versionFiles(Paths.get(tablePath)).map(_._1).sorted

  /** The table's commit HISTORY as a DataFrame — the DESCRIBE-HISTORY
    * verb: one row per manifest version still inside the vacuum keep
    * window, oldest first, with the physical footprint and the
    * committed metadata at that version:
    *
    *  - `version`: the commit's manifest version;
    *  - `n_buckets`: buckets the manifest maps (the layout width);
    *  - `n_chain_segments`: total generation references across all
    *    bucket chains — the merge-on-read debt [[compactBucketChains]]
    *    folds and [[tableStats]] advises on;
    *  - `meta`: the manifest's `#key=value` map (spec, schema, layout,
    *    stream high-waters) verbatim.
    *
    * Driver-side by design: one listing + one manifest read per
    * version, bounded by the keep window (the same bound every
    * maintenance advisor rides); nothing row-scale. Exposed to pure
    * SQL as `spark.read.format("graft-table").option("history",
    * "true")`.
    */
  def tableHistory(spark: SparkSession, tablePath: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    def historyRow(v: Long, manifest: Map[Long, String],
        meta: Map[String, String]) =
      org.apache.spark.sql.Row(v, manifest.size.toLong,
        manifest.valuesIterator.map(chainOf(_).size.toLong).sum, meta)
    // ONE listing, then each listed manifest read directly — per-version
    // manifestAndMetaAt would re-list the directory per version (O(V²)
    // entries) AND fail loudly on a version a concurrent vacuum pruned
    // between the listing and the read; a pruned row just drops out of
    // the sliding history instead
    val entries = versionFiles(Paths.get(tablePath)).sortBy(_._1)
    val rows = entries.flatMap { case (v, p) =>
      try {
        val lines = Files.readAllLines(p).asScala.toSeq
        Some(historyRow(v, parseManifestLines(lines), parseMetaLines(lines)))
      } catch {
        case _: java.nio.file.NoSuchFileException => None // vacuum race
      }
    } match {
      // a pre-versioning table still has readable state at v0; a path
      // with NEITHER is a typo or a never-created table — the silent
      // empty history would read as "no commits", so refuse loudly
      // (the normal read path's own contract, shared with stats/advise)
      case Seq() =>
        Seq(historyRow(0L, legacyOrRefuse(tablePath), Map.empty))
      case rs => rs
    }
    spark.createDataFrame(
      new java.util.ArrayList(rows.asJava), TableHistorySchema)
  }

  /** Loud existence check shared by the read-only SQL maintenance
    * verbs (stats/advise): a mistyped path must error like history
    * does, never read as "0 buckets" or "healthy" — a silent empty
    * answer to a fleet-monitoring query is exactly the wrong-path
    * failure mode these verbs exist to surface.
    */
  private[graft] def requireTableState(tablePath: String): Unit =
    if (versionFiles(Paths.get(tablePath)).isEmpty) { legacyOrRefuse(tablePath); () }

  /** The legacy (pre-versioning) manifest, or the ONE shared
    * never-created refusal — the single wording/semantics source for
    * history, stats and advise (two drifting copies would silently
    * diverge the refusals the specs pin to match).
    */
  private def legacyOrRefuse(tablePath: String): Map[Long, String] = {
    val legacy = legacyManifest(tablePath)
    require(legacy.nonEmpty,
      s"$tablePath has no committed versions and no legacy " +
        "manifest — wrong path, or the table was never created")
    legacy
  }

  /** [[tableHistory]]'s fixed schema — a constant so the SQL history
    * relation can declare itself WITHOUT reading the commit log (the
    * log is then re-read per scan, never frozen at registration).
    */
  val TableHistorySchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("n_buckets", LongType, nullable = false),
      StructField("n_chain_segments", LongType, nullable = false),
      StructField("meta", MapType(StringType, StringType), nullable = false)))
  }

  /** The bucket→chain manifest as of commit `version`. Fails loudly on
    * a version the vacuum keep window has pruned (or that never
    * committed) — returning the nearest survivor would silently answer
    * a different question.
    */
  private[graft] def manifestAt(tablePath: String, version: Long): Map[Long, String] =
    // ONE definition of the v0 rule and the loud-on-pruned contract:
    // [[manifestAndMetaAt]] (v0 = the pre-first-commit state — the
    // legacy lock-path `_manifest` when one exists, else empty — so a
    // change feed FROM v0 is the full bootstrap image, the contract the
    // streaming source's `startingVersion=0` documents)
    manifestAndMetaAt(tablePath, version)._1

  /** Manifest metadata as of commit `version` (empty for v0 and for
    * pre-meta manifests). Same loud-on-pruned contract as [[manifestAt]].
    */
  private def metaAt(tablePath: String, version: Long): Map[String, String] =
    manifestAndMetaAt(tablePath, version)._2

  /** Best-effort reclamation of generation directories no manifest entry
    * references (superseded or orphaned by a crash), plus stale
    * `_manifest.tmp-*` files a writer crash left behind.
    *
    * `graceManifests` guards stalled readers: a reader that resolved the
    * manifest just before a superseding commit may still be scanning the
    * old generation when the vacuum runs. With grace N, every generation
    * referenced by any of the N most recent committed manifest snapshots
    * (`_hist/`, ordered by batchId then attempt) is retained in addition
    * to the current one — the reader's whole resolved view survives.
    * Grace 0 reclaims everything unreferenced (the round-5 behavior).
    *
    * `quiesceMs` guards CONCURRENT WRITERS: an unreferenced `gen-*`
    * directory (or `_manifest.tmp-*` file) may belong to a commit in
    * flight right now — staged but not yet manifest-swapped — so only
    * entries quiescent longer than the dwell are reclaimed. The default
    * minute dwarfs any stage-commit window; pass 0 only when no writer
    * can be active (tests, offline maintenance).
    *
    * On an optimistic-protocol table the versioned chain doubles as the
    * history: the `graceManifests` most recent `_manifest.v*` snapshots
    * (plus the head) contribute to the live set, the chain is pruned to
    * a bounded keep window, and abandoned hidden put-staging files are
    * swept under the same dwell. The keep window is deliberately wide
    * (≥ 64 versions): a writer stalled between reading head vN and
    * attempting v(N+1) for longer than the window could otherwise
    * publish a version number below an already-pruned one — the same
    * retention-must-exceed-transaction-duration contract every
    * versioned-log table format documents.
    */
  /** Read-only vacuum PREVIEW: what [[vacuumGenerations]] with the same
    * `graceManifests` would reclaim, and how much it weighs — the
    * operational "is retention sized right / is it worth running"
    * question answered without mutating anything. The real vacuum
    * additionally applies its quiescence dwell, so an in-flight
    * writer's staged generation can appear here as reclaimable and
    * still (correctly) survive the actual run.
    */
  final case class VacuumStats(liveGenerations: Int,
      reclaimableGenerations: Seq[String], reclaimableBytes: Long,
      retainedVersions: Int)

  def vacuumStats(tablePath: String,
      graceManifests: Int = 0): VacuumStats = {
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) return VacuumStats(0, Seq.empty, 0L, 0)
    import scala.jdk.CollectionConverters._
    val vfiles = versionFiles(dir).sortBy(_._1)
    // the SAME live-set rule as vacuumGenerations below
    val live = readManifest(tablePath).values.flatMap(chainOf).toSet ++
      recentHistory(dir, graceManifests).flatMap(h => manifestValues(h)) ++
      vfiles.takeRight(graceManifests + 1).flatMap { case (_, p) => manifestValues(p) }
    val s = Files.list(dir)
    val gens = try s.iterator().asScala.toList
      .filter(_.getFileName.toString.startsWith("gen-")) finally s.close()
    val dead = gens.filterNot(p => live.contains(p.getFileName.toString))
      .sortBy(_.getFileName.toString)
    val bytes = dead.map { p =>
      // same concurrent-reclaim tolerance as tableStats: a vacuum can
      // delete a dead generation mid-walk — count what remains
      try {
        val w = Files.walk(p)
        try w.iterator().asScala
          .map(q => scala.util.Try(
            if (Files.isRegularFile(q)) Files.size(q) else 0L).getOrElse(0L))
          .sum
        finally w.close()
      } catch {
        case _: java.nio.file.NoSuchFileException => 0L
        case e: java.io.UncheckedIOException
            if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => 0L
      }
    }.sum
    VacuumStats(live.size, dead.map(_.getFileName.toString), bytes,
      vfiles.size)
  }

  /** A retention recommendation — see [[adviseRetention]]. */
  final case class RetentionAdvice(head: Long, oldestReadable: Long,
      laggard: Option[(String, Long)], requiredGraceManifests: Int,
      intact: Boolean, reason: String)

  /** Size the vacuum keep window from OBSERVED consumer lag — the other
    * half of the retention contract every feed reader documents ("size
    * the keep window to exceed the stream's worst-case downtime"), which
    * until now the operator had to guess at. `consumers` are
    * (label, position) pairs: the oldest table version each consumer
    * still reads FROM —
    *
    *  - a maintained view: [[MaterializedAggView.watermark]] (a refresh
    *    or maintenance stream reads the feed from exactly there);
    *  - a `graft-changes` stream: [[graft.sources.ChangeFeedSourceProvider
    *    .checkpointPosition]]`._1` (the committed resume position);
    *  - a [[ChangeFeedConsumer]] poller: its persisted checkpoint.
    *
    * The advice: `requiredGraceManifests` is the SMALLEST
    * `graceManifests` under which [[vacuumGenerations]] keeps every
    * version from the slowest consumer's position to the head fully
    * readable (manifests AND the generations they reference — the
    * vacuum's live set is `takeRight(grace + 1)` version files, so the
    * bound is the count of versions above the laggard). `intact` reports
    * whether the laggard's position is STILL whole right now (its
    * manifest listed and every generation its chains reference present)
    * — false means a past vacuum already outran this consumer and its
    * next read will fail loudly; re-seed it (views: re-bootstrap)
    * rather than widening retention after the fact. With no consumers,
    * grace 0 suffices (current-head readers only).
    */
  def adviseRetention(tablePath: String,
      consumers: Seq[(String, Long)]): RetentionAdvice = {
    val versions = tableVersions(tablePath)
    require(versions.nonEmpty,
      s"$tablePath has no committed versions — nothing to retain")
    val head = versions.max
    val oldest = versions.min
    // validate EVERY consumer, not just the laggard — a misconfigured
    // label pointing at a different table must surface even when some
    // other consumer happens to lag lower
    consumers.foreach { case (label, v) =>
      require(v >= 0 && v <= head,
        s"$tablePath: consumer '$label' reports position v$v outside " +
          s"the committed range [0, $head] — is it a consumer of a " +
          "different table?")
    }
    val laggard = consumers.minByOption(_._2)
    val need = laggard.map(_._2).getOrElse(head)
    val required = versions.count(_ > need)
    val intact = laggard.forall { case (_, v) =>
      // v0 is the synthetic pre-first-commit state — always "readable".
      // Concurrent-reclaim tolerance (the same markers() discipline as
      // tableStats/vacuumStats): a vacuum pruning the laggard's version
      // file between the tableVersions snapshot and this read means
      // exactly "outran" — report intact=false, never throw from a
      // read-only advisor
      v == 0L || (versions.contains(v) &&
        scala.util.Try {
          import scala.jdk.CollectionConverters._
          val s = Files.list(Paths.get(tablePath))
          val gensOnDisk = try s.iterator().asScala
            .map(_.getFileName.toString).filter(_.startsWith("gen-")).toSet
          finally s.close()
          manifestAt(tablePath, v).values.flatMap(chainOf)
            .forall(gensOnDisk.contains)
        }.getOrElse(false))
    }
    RetentionAdvice(head, oldest, laggard, required, intact,
      laggard match {
        case None =>
          "no lagging consumers registered — grace 0 retains the head " +
            "for current readers"
        case Some((label, v)) if !intact =>
          s"consumer '$label' still needs v$v but retention already " +
            "outran it (manifest pruned or generations reclaimed) — " +
            "re-seed that consumer; future runs need graceManifests >= " +
            s"$required"
        case Some((label, v)) =>
          s"slowest consumer '$label' reads from v$v (head v$head) — " +
            s"vacuum with graceManifests >= $required to keep its whole " +
            "catch-up range alive"
      })
  }

  def vacuumGenerations(tablePath: String, graceManifests: Int = 0,
      quiesceMs: Long = 60000L): Seq[String] = {
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val vfiles = versionFiles(dir).sortBy(_._1)
    // manifest values are generation CHAINS — every chain member is live
    val live = readManifest(tablePath).values.flatMap(chainOf).toSet ++
      recentHistory(dir, graceManifests).flatMap(h => manifestValues(h)) ++
      vfiles.takeRight(graceManifests + 1).flatMap { case (_, p) => manifestValues(p) }
    val s = Files.list(dir)
    val (gens, staleTmp) =
      try {
        val entries = s.iterator().asScala.toList
        (entries.filter(_.getFileName.toString.startsWith("gen-")),
         entries.filter { p =>
           val n = p.getFileName.toString
           n.startsWith("_manifest.tmp-") ||
             // a crashed putIfAbsent's hidden staging file
             (n.startsWith("._manifest.") && n.contains(".put-")) ||
             (n.startsWith("._layout") && n.contains(".put-"))
         })
      } finally s.close()
    // prune the version chain beyond the keep window (see scaladoc for
    // why the window must dwarf any writer's stage-commit span)
    vfiles.dropRight(math.max(graceManifests + 1, 16) * 4)
      .foreach { case (_, p) => Files.deleteIfExists(p) }
    // only reclaim tmp files demonstrably ABANDONED: a concurrent writer
    // may be between writeFsynced(tmp) and the atomic rename right now,
    // and deleting its tmp would fail that commit. One minute dwarfs any
    // write-fsync-rename window while still reclaiming crash leftovers.
    val tmpGraceMs = quiesceMs
    val now = System.currentTimeMillis()
    staleTmp
      .filter(p => now - Files.getLastModifiedTime(p).toMillis > tmpGraceMs)
      .foreach(Files.deleteIfExists(_))
    // prune _hist beyond what the reader grace window needs — a
    // long-running streaming sink otherwise accumulates one snapshot per
    // commit forever (keep a healthy multiple so the window can be
    // widened retroactively)
    pruneHistory(dir, keep = math.max(graceManifests + 1, 16) * 4)
    gens.filterNot(p => live.contains(p.getFileName.toString))
      // same dwell rule as the tmp sweep, for generation DIRECTORIES: a
      // concurrent writer may be between staging gen-N and its manifest
      // commit right now — the dir exists, no manifest references it yet,
      // and deleting it would tear the commit. Quiescence is judged on
      // the NEWEST mtime in the tree, not the dir's own: an in-flight
      // job writes only under nested `_temporary` paths (the dir mtime
      // advances at job start and commit but not in between), so an
      // active long write keeps its deep mtime fresh while a crashed
      // job's leftovers go stale and reclaim after the same dwell. The
      // walk touches only UNREFERENCED gen dirs — bounded.
      .filter(p => now - newestMtimeMs(p) > tmpGraceMs)
      .sortBy(_.getFileName.toString)
      .map { p => deleteRecursively(p); p.getFileName.toString }
  }

  /** Newest modification time anywhere under `p` — the in-flight-write-
    * aware quiescence clock of [[vacuumGenerations]]'s generation sweep.
    */
  private[sink] def newestMtimeMs(p: Path): Long = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.iterator().asScala
      .map(q => scala.util.Try(Files.getLastModifiedTime(q).toMillis)
        .getOrElse(Long.MaxValue)) // vanished mid-walk: treat as active
      .foldLeft(0L)(math.max)
    finally s.close()
  }

  /** Delete `_hist/` snapshots beyond the newest `keep` (by commit
    * order). Called from vacuum so history stays bounded for long-running
    * sinks.
    */
  private def pruneHistory(dir: Path, keep: Int): Unit = {
    histSnapshots(dir).sortBy(p => genOrder(p.getFileName.toString))
      .reverse.drop(keep)
      .foreach(Files.deleteIfExists(_))
  }

  /** Committed `_hist/` snapshots — hidden entries (in-flight `.tmp`
    * writes) are excluded, both to skip unparseable names and to leave a
    * concurrent commit's staging file alone.
    */
  private def histSnapshots(dir: Path): List[Path] = {
    val hist = dir.resolve("_hist")
    if (!Files.exists(hist)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(hist)
    try s.iterator().asScala.toList
      .filterNot(_.getFileName.toString.startsWith("."))
    finally s.close()
  }

  /** The `n` most recent `_hist/` manifest snapshots, newest first,
    * ordered by the (batchId, attempt) encoded in the generation name.
    */
  private def recentHistory(dir: Path, n: Int): Seq[Path] = {
    if (n <= 0) return Seq.empty
    // the newest snapshot duplicates the current manifest, so reaching n
    // PRIOR committed manifests means taking n+1 snapshots
    histSnapshots(dir).sortBy(p => genOrder(p.getFileName.toString))
      .reverse.take(n + 1)
  }

  /** Sort key for generation names: `gen-<batchId>` < `gen-<batchId>-r<k>`. */
  private def genOrder(gen: String): (Long, Int) = {
    val parts = gen.stripPrefix("gen-").split("-r", 2)
    (parts(0).toLong, if (parts.length > 1) parts(1).toInt else 0)
  }

  private def manifestValues(p: Path): Set[String] = {
    import scala.jdk.CollectionConverters._
    // tolerate a malformed line (e.g. a pre-tmp-discipline truncated
    // snapshot): skipping it only RETAINS extra generations, never
    // deletes live ones. Values are `;`-chains — every member is live.
    Files.readAllLines(p).asScala.filter(_.contains(","))
      .flatMap(l => chainOf(l.split(",", 2)(1))).toSet
  }
}

/** Date-partitioned event storage: the layout that makes time-ranged
  * queries at 100 TB read only their days (partition pruning at the
  * scan, verified in PartitionedSinkSpec via the PartitionFilters of the
  * physical scan). Hive-style `day=YYYY-MM-DD/` directories.
  */
object PartitionedSink {

  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      // UTC day from epoch-microsecond arithmetic — date_format renders
      // in spark.sql.session.timeZone, so the partition label would
      // depend on session config (two differently-configured writers
      // would split the same UTC day across partitions); this form is
      // config-independent and identical to the old one under the
      // repo's pinned-UTC sessions
      .withColumn("day", date_add(lit("1970-01-01").cast("date"),
        floor(unix_micros(col("ts_utc")) / lit(86400000000L)).cast("int"))
        .cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === day)
}

object AuditSink {

  /** K3: the observe channel — union of all stage outputs with a stage tag.
    * In the reference this is the catch-all observeRule delivering every
    * bus event to the observe Lambda (stack.ts:276-283). Union is the
    * Spark-native multicast-listener: no shuffle, partitions concatenate.
    */
  def tap(stages: Map[String, DataFrame]): DataFrame = {
    require(stages.nonEmpty,
      "AuditSink.tap needs at least one stage (an empty reduce would throw opaquely)")
    stages
      .map { case (stage, df) =>
        df.select(
          lit(stage).as("stage"),
          col("source"), col("detailType"), col("time"))
      }
      .reduce(_ unionByName _)
  }

  /** The README.md:27 "tally" the reference suggests but never built:
    * reconcile extracted-vs-loaded counts per stage.
    */
  def tally(audit: DataFrame): DataFrame =
    audit.groupBy(col("stage")).agg(count(lit(1)).as("n")).orderBy(col("stage"))
}
