package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental consumption driver over [[KeyedUpsertSink.readChangesBetween]]:
  * the "process only what changed since the last run" loop a
  * training-data pipeline runs instead of re-reading 100 TB. Tracks the
  * last processed version in a checkpoint file and hands each new
  * version range's upserts to `process`.
  *
  * Crash contract: the checkpoint advances AFTER `process` returns, so
  * a consumer that dies mid-range replays that range on restart —
  * at-least-once, which an idempotent downstream (an LWW sink, the norm
  * in this engine) absorbs to effectively-once. The checkpoint write is
  * write-fsync + atomic rename, so a torn checkpoint cannot exist.
  *
  * Retention contract: `fromVersion` must still be inside the table's
  * vacuum keep window. A consumer stalled past it fails LOUDLY
  * (manifestAt's documented error) rather than silently skipping the
  * pruned history — re-bootstrap deliberately via [[bootstrap]].
  */
object ChangeFeedConsumer {

  private def readCheckpoint(p: Path): Option[Long] =
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption

  private def writeCheckpoint(p: Path, v: Long): Unit = {
    val tmp = p.resolveSibling(s".${p.getFileName}.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        s"$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** First run: hand the WHOLE resolved table (at the current head) to
    * `process` and checkpoint that head. Returns the bootstrapped head,
    * or None when the table has no commits yet.
    */
  def bootstrap(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], checkpointPath: String)(
      process: DataFrame => Unit): Option[Long] = {
    val versions = KeyedUpsertSink.tableVersions(tablePath)
    if (versions.isEmpty) return None
    val head = versions.max
    process(KeyedUpsertSink.readBucketedDelta(
      spark, tablePath, keys, order, atVersion = Some(head)))
    writeCheckpoint(Paths.get(checkpointPath), head)
    Some(head)
  }

  /** One poll: process the upserts between the checkpointed version and
    * the current head, then advance the checkpoint. Returns the
    * (from, to] range processed; None when nothing new committed (the
    * idle steady state — `process` is NOT called) or the consumer has
    * never bootstrapped (call [[bootstrap]] first; deliberate, so a
    * fresh consumer cannot silently treat 100 TB of history as "one
    * change batch" by accident).
    */
  def processNew(spark: SparkSession, tablePath: String,
      keys: Seq[String], order: Seq[Column], checkpointPath: String)(
      process: DataFrame => Unit): Option[(Long, Long)] = {
    val ckpt = Paths.get(checkpointPath)
    val last = readCheckpoint(ckpt).getOrElse(throw new IllegalStateException(
      s"$checkpointPath: no checkpoint — bootstrap the consumer first " +
        "(a fresh consumer must not silently process the whole history " +
        "as one change batch)"))
    val head = KeyedUpsertSink.tableVersions(tablePath).max
    if (head == last) return None
    process(KeyedUpsertSink.readChangesBetween(
      spark, tablePath, keys, order, fromVersion = last,
      toVersion = Some(head)))
    writeCheckpoint(ckpt, head)
    Some((last, head))
  }
}
