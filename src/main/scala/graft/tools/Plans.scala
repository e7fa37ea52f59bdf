package graft.tools


import graft.SparkEntry

/** Dev-only: dump formatted physical plans for named queries.
  * Usage: runMain graft.tools.Plans <sfDir> <name> [name...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
        val spark = ProbeCorpus.session(4)
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
