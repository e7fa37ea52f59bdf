package graft.sink

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Engine-level observability (K3/K4, SURVEY.md §2.4): where the
  * reference taps every bus event into an observe Lambda, the engine-side
  * analogue is a StreamingQueryListener — zero data-plane cost, per-batch
  * progress (rows, durations, state size) for every streaming query on
  * the session.
  */
object Telemetry {

  case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      durationMs: Long)

  /** Collects per-batch progress for all streaming queries. Thread-safe
    * snapshot via `progress`. Retention is BOUNDED: a listener attached
    * to a long-running session otherwise accumulates one entry per
    * micro-batch per query for its lifetime — an unbounded driver-memory
    * leak on exactly the deployments the listener exists for. The newest
    * `maxEntries` entries are ALWAYS retained (a reader sizing
    * `maxEntries` to a required window gets the whole window); the
    * buffer may transiently hold up to 2×`maxEntries` between the
    * amortized trims.
    */
  class ProgressListener(maxEntries: Int = 100000) extends StreamingQueryListener {
    private val buf = ArrayBuffer.empty[BatchProgress]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      record(BatchProgress(
        Option(e.progress.name).getOrElse(e.progress.id.toString),
        e.progress.batchId,
        e.progress.numInputRows,
        e.progress.batchDuration))

    /** Appends one entry under the retention rule (the listener callback
      * delegates here; package-private so the retention spec can drive it
      * without fabricating Spark progress events).
      */
    private[graft] def record(bp: BatchProgress): Unit =
      buf.synchronized {
        buf += bp
        // amortized trim: let the buffer grow to 2× before cutting back
        // to exactly maxEntries, so retention never dips below the
        // documented window while each entry still pays O(1) amortized
        if (buf.length >= 2 * maxEntries) buf.remove(0, buf.length - maxEntries)
      }

    def progress: Seq[BatchProgress] = buf.synchronized(buf.toSeq)
  }

  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: ProgressListener): Unit =
    spark.streams.removeListener(l)
}
