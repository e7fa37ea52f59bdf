package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Intermediate-result staging — the ONE seam behind every eager pin in
  * the iterative operators (Lloyd training rounds, connected-components
  * rounds, SemDeDup's shared assignment, the curation survivor set).
  *
  * All strategies share the contract the operators rely on:
  *
  *  1. **eager** — the staged result is fully materialized before `pin`
  *     returns, so an iterative round never re-executes its predecessors;
  *  2. **lineage-cutting** — downstream plans see a leaf (checkpoint RDD
  *     or `InMemoryRelation`), not the nested upstream plan. This is
  *     load-bearing beyond fault tolerance: self-join rounds over a
  *     non-truncated plan send Catalyst's sizeInBytes estimation into
  *     BigInteger blowup (stats multiply across replicated subtrees —
  *     measured minutes of driver CPU);
  *  3. **value-identical** — staging never changes data, only where it
  *     lives, so oracle hashes are unaffected by the strategy choice
  *     (StagingStrategySpec pins this).
  *
  * Strategy selection: `-Dgraft.staging=local|persist|reliable`.
  *
  *  - `local` (default): `localCheckpoint(eager)` — executor-local,
  *    non-replicated blocks. Cheapest pin; right for single-JVM and for
  *    any cluster job cheap enough to re-run from scratch on executor
  *    loss. NOT fault-tolerant: a lost executor truncates recovery too.
  *  - `persist`: the computed InternalRow RDD persists at
  *    MEMORY_AND_DISK and a leaf DataFrame is rebuilt over it. Catalyst
  *    sees a leaf (contract 2 holds); the RDD keeps its own lineage, so
  *    executor loss recomputes lost blocks instead of failing the job.
  *    The cluster default you want for long multi-stage jobs.
  *  - `reliable`: `checkpoint(eager)` into the job's checkpoint
  *    directory (set `spark.sparkContext.setCheckpointDir` to durable
  *    storage on a real cluster; we default it to a temp dir if unset so
  *    the strategy is runnable out of the box). Survives executor loss
  *    outright; pays one write + read of the staged data.
  *
  * [[unpin]] releases a staged frame's blocks for `local`/`persist`;
  * reliable checkpoint files live until the checkpoint dir is cleaned
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` on a cluster).
  */
object Staging {

  sealed trait Strategy
  case object Local extends Strategy
  case object Persist extends Strategy
  case object Reliable extends Strategy

  /** Read per call (not cached) so tests and embedding applications can
    * switch strategies at runtime.
    */
  def strategy: Strategy = sys.props.getOrElse("graft.staging", "local") match {
    case "local"    => Local
    case "persist"  => Persist
    case "reliable" => Reliable
    case other => throw new IllegalArgumentException(
      s"graft.staging must be local|persist|reliable, got: $other")
  }

  /** `persist`-strategy bookkeeping: the staged RDD backing each pinned
    * frame, so [[unpin]] can free its blocks promptly (the frame itself
    * is a plain leaf plan with no CacheManager entry). Weak keys: a
    * dropped frame's entry vanishes with it and the ContextCleaner
    * reclaims the blocks.
    */
  private val pinnedRdds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, org.apache.spark.rdd.RDD[_]]())

  /** Eagerly materialize `df` and cut its lineage (see class doc). */
  def pin(df: DataFrame): DataFrame = strategy match {
    case Local => df.localCheckpoint(true)
    case Persist =>
      // A bare df.persist() would keep the full ANALYZED plan under every
      // consumer — iterative callers (CC rounds, Lloyd rounds) then nest
      // plans without bound, which is the Catalyst/BigInteger stats
      // blowup contract item 2 exists to prevent (observed: a fatal
      // appStatus-listener error from the unbounded plan graph). Instead:
      // persist the computed InternalRow RDD (codegen reuses row buffers,
      // hence the copy) and rebuild a LEAF DataFrame over it. Catalyst
      // sees a leaf; the RDD keeps its lineage, so a lost executor
      // recomputes lost blocks instead of failing the job.
      val rows = df.queryExecution.toRdd.map(_.copy())
        .persist(StorageLevel.MEMORY_AND_DISK)
      rows.count() // materialize now: round r+1 must not re-run round r
      val staged = org.apache.spark.sql.graft.Bridge
        .leafDataFrame(df.sparkSession, rows, df.schema)
      pinnedRdds.put(staged, rows)
      staged
    case Reliable =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-staging").toString)
      df.checkpoint(true)
  }

  /** Release a pinned frame's storage (no-op under `reliable`). Under
    * `local`, `Dataset.unpersist` alone would be a SILENT no-op — a
    * local checkpoint's blocks belong to the checkpointed RDD, not a
    * CacheManager entry — so the leaf RDD itself is unpersisted, making
    * the iterative operators' eager round-release actually prompt. The
    * contract stands: unpin only after the frame's LAST use (a released
    * local checkpoint cannot recompute).
    */
  def unpin(df: DataFrame): Unit = {
    Option(pinnedRdds.remove(df)).foreach(_.unpersist(false))
    org.apache.spark.sql.graft.Bridge.leafRdd(df).foreach(_.unpersist(false))
    df.unpersist(false)
    ()
  }
}
