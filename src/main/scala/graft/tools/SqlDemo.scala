package graft.tools
import graft.Tables
import graft.functions.GraftFunctions
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = ProbeCorpus.session(8)
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    GraftFunctions.register(spark)
    println("DEMO " + spark.sql("SELECT count(*) FROM lineitem").head().getLong(0))
    println("DEMO " + spark.sql(
      "SELECT event_type, count(*) FROM events GROUP BY 1 ORDER BY 1 LIMIT 2").collect().mkString(","))
    println("DEMO " + spark.sql(
      "SELECT graft_simhash(split(text, ' ')) FROM documents LIMIT 1").head().getLong(0))
    spark.stop()
  }
}
