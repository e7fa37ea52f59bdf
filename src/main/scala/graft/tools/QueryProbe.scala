package graft.tools

import java.nio.file.{Files, Paths}


import graft.{SparkEntry, VerifyJson}

/** Dev-only: run a NAMED SUBSET of SparkEntry.queries against an sf dir
  * and dump result parquet + the matching oracle_sql.json slice, so
  * `tools/check_oracle.py` can gate just the queries under development
  * instead of the full contract.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <outDir> <name> [name...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: QueryProbe <sfDir> <outDir> <queryName> [queryName...]")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        val spark = ProbeCorpus.session(8)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      VerifyJson.render(SparkEntry.oracleSql.view.filterKeys(names.contains).toMap))
    spark.stop()
  }
}
