package graft.tools


import graft.SparkEntry

/** Dev-only: time named queries with repeats inside one warm JVM.
  * Usage: runMain graft.tools.Timeit <sfDir> <reps> <name> [name...]
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
        val spark = ProbeCorpus.session()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"TIMEIT $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
