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
    * snapshot via `progress`. Retention is BOUNDED (`maxEntries`, newest
    * kept): a listener attached to a long-running session otherwise
    * accumulates one entry per micro-batch per query for its lifetime —
    * an unbounded driver-memory leak on exactly the deployments the
    * listener exists for.
    */
  class ProgressListener(maxEntries: Int = 100000) extends StreamingQueryListener {
    private val buf = ArrayBuffer.empty[BatchProgress]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      buf.synchronized {
        buf += BatchProgress(
          Option(e.progress.name).getOrElse(e.progress.id.toString),
          e.progress.batchId,
          e.progress.numInputRows,
          e.progress.batchDuration)
        // amortized trim: drop the oldest half when the cap is exceeded
        if (buf.length > maxEntries) buf.remove(0, buf.length - maxEntries / 2)
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
