package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector tests: deterministic generation, column
  * pruning reaching the scan, and paced micro-batch streaming that
  * converges to the batch result.
  */
class SyntheticEventsSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Long) = spark.read.format("graft-events")
    .option("rows", rows).load()

  test("batch read is deterministic and respects the rows option") {
    val a = read(1000).collect()
    val b = read(1000).collect()
    assert(a.length == 1000)
    assert(a.sameElements(b))
    // sanity on field distribution
    val types = read(1000).select("event_type").distinct().as[String].collect().toSet
    assert(types == Set("click", "view", "signup", "purchase", "error"))
  }

  test("column pruning reaches the DSv2 scan") {
    val df = read(100).select("event_id")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("event_id"),
      s"expected pruned schema, got ${scan.scan.readSchema()}")
    assert(df.count() == 100)
  }

  test("micro-batch stream paces by rowsPerTrigger and converges to batch") {
    val stream = spark.readStream.format("graft-events")
      .option("rows", 1000).option("rowsPerTrigger", 300).load()
    val listener = graft.sink.Telemetry.attach(spark)
    try {
      val q = stream.groupBy("event_type").count()
        .writeStream.format("memory").queryName("synth_out")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("synth_out")
        .as[(String, Long)].collect().toMap
      val want = read(1000).groupBy("event_type").count()
        .as[(String, Long)].collect().toMap
      assert(got == want)
      // pacing: 1000 rows / 300 per trigger -> at least 4 batches
      val deadline = System.currentTimeMillis() + 10000
      def batches = listener.progress.filter(p => p.queryName == "synth_out" && p.numInputRows > 0)
      while (batches.size < 4 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(batches.size >= 4, s"expected >=4 paced batches, got ${batches.size}")
      assert(batches.map(_.numInputRows).sum == 1000)
    } finally graft.sink.Telemetry.detach(spark, listener)
  }
}
