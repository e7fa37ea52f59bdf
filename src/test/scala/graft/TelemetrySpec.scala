package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.Telemetry

/** Pins the ProgressListener retention contract: a reader sizing
  * `maxEntries` to a required window must ALWAYS see at least that many
  * of the newest entries once the window has filled (the old trim cut to
  * maxEntries/2, silently halving the documented window after the first
  * trim).
  */
class TelemetrySpec extends AnyFunSuite {

  private def fill(l: Telemetry.ProgressListener, n: Int): Unit =
    (1 to n).foreach(i => l.record(Telemetry.BatchProgress("q", i.toLong, i.toLong, 1L)))

  test("retention never dips below maxEntries; newest entries are kept") {
    val l = new Telemetry.ProgressListener(maxEntries = 100)
    fill(l, 1000) // many trim cycles
    val got = l.progress
    assert(got.length >= 100 && got.length < 200,
      s"buffer length ${got.length} outside the [max, 2*max) envelope")
    assert(got.map(_.batchId).takeRight(100) == (901L to 1000L),
      "the newest 100 entries must survive every trim")
  }

  test("mid-cycle the buffer holds a contiguous newest suffix") {
    val l = new Telemetry.ProgressListener(maxEntries = 100)
    fill(l, 1050) // 50 entries past the last trim
    val ids = l.progress.map(_.batchId)
    assert(ids == (ids.head to 1050L), "retained entries must be a contiguous suffix")
    assert(ids.length >= 100)
  }
}
