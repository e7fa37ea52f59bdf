package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.functions.GraftFunctions
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
