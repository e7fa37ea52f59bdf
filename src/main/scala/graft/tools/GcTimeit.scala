package graft.tools

import graft.SparkEntry

/** Dev-only: Timeit with a Bench-style System.gc() settle before each rep
  * — used to verify the settle no longer taxes the following timed query
  * now that -Xms pins the committed heap (see build.sbt javaOptions).
  */
object GcTimeit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
        val spark = ProbeCorpus.session()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"GCTIMEIT $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
