package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last 2000 chars of stdout; the artifact line
  * (compact keys + 2-decimal walls) must fit alongside sbt's trailing
  * [success] line (~76 chars). Round 7's 79-query full-name line already
  * clipped its opening brace — these guards keep the 90-query line inside
  * the window and the compact-key scheme invertible.
  */
class BenchArtifactSpec extends AnyFunSuite {

  test("every headline query exists in SparkEntry.queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names without a query: $missing")
  }

  test("compact keys are collision-free over the headline set") {
    val keys = Bench.headline.map(Bench.compactKey)
    val dups = keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"compact-key collisions: $dups")
  }

  test("worst-case artifact line fits the driver's 2000-char tail") {
    // worst case: every wall two digits before the point ("99.99" = 5 chars),
    // total five digits ("99999.999"), three-digit n_passed, the WORST
    // bounded failed list (compact keys since round 15, capped at 2 names
    // + a "+K" overflow marker — budget the 2 LONGEST compact keys in the
    // headline set; the full artifact carries the complete list), longest
    // sf basename in testdata
    val qs = Bench.headline
      .map(n => "\"" + Bench.compactKey(n) + "\":99.99")
      .mkString("{", ",", "}")
    val worstFailed = (Bench.headline.map(Bench.compactKey)
      .sortBy(-_.length).take(2).map("\"" + _ + "\"") :+ "\"+99\"")
      .mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":99999.999,"unit":"sec","old_total":99999.999,"n_passed":999,"queries":$qs,"failed":$worstFailed,"sf":"sf0.001"}"""
    assert(line.length <= 1900,
      s"artifact line ${line.length} chars — exceeds the 1900-char safety budget " +
        "(2000-char driver tail minus sbt's [success] line); shorten keys")
  }

  test("failed queries do not count toward the headline total") {
    val walls = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 0.05)
    assert(Bench.passedTotal(walls, Set("c")) == 3.0)
    assert(Bench.passedTotal(walls, Set.empty) == 3.05)
    assert(Bench.passedTotal(Seq.empty, Set.empty) == 0.0)
  }
}
