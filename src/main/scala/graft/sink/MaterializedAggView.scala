package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained group-by view over a versioned keyed table
  * ([[KeyedUpsertSink]] optimistic / delta protocol): the classic
  * materialized-view maintenance loop. `refresh` reads the WEIGHTED
  * change feed ([[KeyedUpsertSink.readChangesWeighted]]) from the
  * view's watermark to the base table's head — O(changed buckets), never
  * the base table — and folds `sum(expr * __weight)` per group into the
  * stored view: +1 rows add each updated key's new contribution, -1
  * rows subtract its superseded one. At 100 TB base scale a refresh
  * costs the CHANGE volume plus a view-sized merge, where a recompute
  * costs the table.
  *
  * Supported aggregates are the distributive sums ([[AggCol]]): SUM of
  * any deterministic row-level expression, COUNT as `sum(1)`. AVG
  * derives on read (`sum/n`). MIN/MAX are deliberately absent — a
  * retracted current-minimum needs the base rows to re-derive, which is
  * exactly the recompute this view exists to avoid.
  *
  * Exactness contract: with exact-typed expressions (integral /
  * decimal) the maintained view equals the from-scratch recompute
  * bit-for-bit — integer adds commute with retraction. Floating-point
  * sums drift under reordering; use decimals where equality matters.
  * ANSI overflow on a maintained sum fails loudly (bound the expression
  * or aggregate through a decimal).
  *
  * Storage and crash contract: each refresh publishes the merged view
  * as `viewPath/v<headVersion>/` (staged, then one atomic rename) and
  * THEN advances the `_head` watermark file (the sink's audited
  * write-fsync + atomic-rename primitive). The watermark is the commit
  * point: a crash between the two leaves a complete-but-unreferenced
  * `v<H>` directory that the re-run deterministically rebuilds and
  * replaces — replaying the same (watermark, head] delta range produces
  * the same view, so the maintenance loop is effectively-once without a
  * transaction log. The previous view version is retained for in-flight
  * readers (one-version grace, the view-side analogue of the base
  * table's vacuum `graceManifests`); older versions are reclaimed at
  * publish. Single maintainer per view path — concurrent refreshers
  * would race the stage/rename; run the loop from one driver, like
  * [[ChangeFeedConsumer]].
  *
  * Retention: the watermark must stay inside the base table's vacuum
  * keep window. A view stalled past it fails with `manifestAt`'s loud
  * error — re-bootstrap deliberately with `force = true`.
  */
object MaterializedAggView {

  /** One maintained aggregate: `SUM(expr)` published as `name`.
    * `expr` is evaluated against the base table's resolved rows and
    * must be deterministic and row-level. COUNT is `AggCol(n, lit(1L))`.
    */
  final case class AggCol(name: String, expr: Column)

  private val WeightCol = "__weight"

  /** Hidden per-group live-row count; a group leaves the view when its
    * last contributing key is retracted (count reaches 0).
    */
  private val CountCol = "__n"

  /** Test seam: runs between the view-data publish and the watermark
    * advance — the crash window the scaladoc's effectively-once argument
    * covers. Production never sets it.
    */
  private[graft] var onBeforeHeadPublish: () => Unit = () => ()

  private def headFile(viewPath: String): Path = Paths.get(viewPath, "_head")

  private def versionDir(viewPath: String, v: Long): Path =
    Paths.get(viewPath, s"v$v")

  /** The view's watermark: the base-table version its stored state
    * reflects. None before bootstrap; corruption is loud (the
    * checkpoint reader's contract), never "fresh".
    */
  def watermark(viewPath: String): Option[Long] =
    ChangeFeedConsumer.readCheckpoint(headFile(viewPath))

  private def validate(dims: Seq[String], aggs: Seq[AggCol]): Unit = {
    require(dims.nonEmpty, "dims must be non-empty — a global (no-group) " +
      "aggregate has no group rows to retract; wrap it in a constant dim")
    require(aggs.nonEmpty, "aggs must be non-empty")
    val names = dims ++ aggs.map(_.name)
    require(names.distinct == names,
      s"dim/agg names collide: ${names.mkString(", ")}")
    require(!names.exists(Set(WeightCol, CountCol)),
      s"$WeightCol/$CountCol are reserved view columns")
  }

  /** One delta (or bootstrap) pass: per-group weighted sums. `weight`
    * is `lit(1L)` at bootstrap and the feed's `__weight` on refresh, so
    * both paths produce identical column types.
    */
  private def aggregate(df: DataFrame, dims: Seq[String],
      aggs: Seq[AggCol], weight: Column): DataFrame = {
    val cols = aggs.map(a => sum(a.expr * weight).as(a.name)) :+
      sum(weight).as(CountCol)
    df.groupBy(dims.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Fold a delta aggregate into the stored view: per-group sums add
    * (`sum` skips the side that lacks the group), then groups whose
    * live-row count hit 0 leave the view.
    */
  private def merge(old: DataFrame, delta: DataFrame, dims: Seq[String],
      aggs: Seq[AggCol]): DataFrame = {
    val sums = aggs.map(_.name) :+ CountCol
    val cols = sums.map(n => sum(col(n)).as(n))
    old.unionByName(delta)
      .groupBy(dims.map(col): _*).agg(cols.head, cols.tail: _*)
      .filter(col(CountCol) =!= 0L)
  }

  /** Stage → atomic-rename the view data, advance the watermark, then
    * reclaim crash leftovers and all but the previous retained version.
    */
  private def publish(viewPath: String, head: Long, view: DataFrame): Unit = {
    val root = Paths.get(viewPath)
    Files.createDirectories(root)
    val stage = root.resolve(
      s".stage-v$head-${java.util.UUID.randomUUID().toString.take(8)}")
    view.write.mode("overwrite").parquet(stage.toString)
    val target = versionDir(viewPath, head)
    // a crash between a past publish and its watermark advance leaves a
    // complete v<head> — this re-run rebuilt the SAME content from the
    // same delta range, so replacing it is the deterministic replay
    if (Files.exists(target)) KeyedUpsertSink.deleteRecursively(target)
    Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
    KeyedUpsertSink.fsyncDir(root)
    onBeforeHeadPublish()
    ChangeFeedConsumer.writeCheckpoint(headFile(viewPath), head)
    // reclamation AFTER the commit point: the new head and its
    // predecessor stay (reader grace); dead stages and older versions go
    import scala.jdk.CollectionConverters._
    val keep: Set[Path] = Set(target) ++
      versionsOnDisk(root).filter(_._1 < head).sortBy(_._1).lastOption.map(_._2)
    Files.list(root).iterator().asScala.toList.foreach { p =>
      val name = p.getFileName.toString
      val stale = (name.startsWith(".stage-") && p != stage) ||
        (name.startsWith("v") && !keep.contains(p) &&
          versionOf(name).nonEmpty)
      if (stale) KeyedUpsertSink.deleteRecursively(p)
    }
  }

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v")) name.drop(1).toLongOption else None

  private def versionsOnDisk(root: Path): Seq[(Long, Path)] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(root)) Seq.empty
    else Files.list(root).iterator().asScala.toList.flatMap { p =>
      versionOf(p.getFileName.toString).map(_ -> p)
    }
  }

  /** First run: full group-by over the base table resolved at its head,
    * published as the view with the head as watermark. Returns that
    * head; None when the base has no commits yet. Refuses an existing
    * view without `force = true` (an accidental re-bootstrap silently
    * discards maintained state and re-reads the whole base).
    */
  def bootstrap(spark: SparkSession, basePath: String, viewPath: String,
      keys: Seq[String], order: Seq[Column], dims: Seq[String],
      aggs: Seq[AggCol], force: Boolean = false): Option[Long] = {
    validate(dims, aggs)
    watermark(viewPath).foreach { v =>
      require(force,
        s"$viewPath already holds a view at watermark v$v — " +
          "re-bootstrapping discards it and re-reads the whole base; " +
          "pass force = true to do that deliberately")
    }
    val versions = KeyedUpsertSink.tableVersions(basePath)
    if (versions.isEmpty) return None
    val head = versions.max
    val base = KeyedUpsertSink.readBucketedDelta(
      spark, basePath, keys, order, atVersion = Some(head))
    require(!base.isEmpty,
      s"$basePath resolves to zero rows at v$head — an empty view has " +
        "no schema to store; bootstrap after the first data commit")
    publish(viewPath, head, aggregate(base, dims, aggs, lit(1L)))
    Some(head)
  }

  /** One maintenance pass: fold the weighted change feed from the
    * watermark to the base head into the view. Returns the (from, to]
    * range applied; None when the base head equals the watermark (idle —
    * nothing is read or written). A head BELOW the watermark is a
    * recreated base table and fails loudly, as does a missing watermark
    * (bootstrap first).
    */
  def refresh(spark: SparkSession, basePath: String, viewPath: String,
      keys: Seq[String], order: Seq[Column], dims: Seq[String],
      aggs: Seq[AggCol]): Option[(Long, Long)] = {
    validate(dims, aggs)
    val from = watermark(viewPath).getOrElse(throw new IllegalStateException(
      s"$viewPath: no watermark — bootstrap the view first (a fresh " +
        "view must not silently treat the whole history as one delta)"))
    val versions = KeyedUpsertSink.tableVersions(basePath)
    if (versions.isEmpty) throw new IllegalStateException(
      s"$basePath has no committed versions — wrong path, or the table " +
        "was deleted/recreated since this view's watermark")
    val head = versions.max
    if (head == from) return None
    if (head < from) throw new IllegalStateException(
      s"$basePath head is v$head but this view's watermark is v$from — " +
        "the table was recreated (or its history replaced); " +
        "re-bootstrap deliberately (force = true)")
    val deltas = KeyedUpsertSink.readChangesWeighted(
      spark, basePath, keys, order, fromVersion = from,
      toVersion = Some(head))
    val deltaAgg = aggregate(deltas, dims, aggs, col(WeightCol))
    val old = spark.read.parquet(versionDir(viewPath, from).toString)
    publish(viewPath, head, merge(old, deltaAgg, dims, aggs))
    Some((from, head))
  }

  /** The view's published columns (dims + aggregate names) at its
    * current watermark. Loud before bootstrap.
    */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val v = watermark(viewPath).getOrElse(throw new IllegalStateException(
      s"$viewPath: no watermark — the view was never bootstrapped"))
    spark.read.parquet(versionDir(viewPath, v).toString).drop(CountCol)
  }
}
