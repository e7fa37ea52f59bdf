package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = Config.verifyArgs(args) // fail fast, named message
    val cpus = Config.cpus()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE size cached/pinned plans' output partitions by bytes
      // (default false keeps the static shuffle.partitions count on every
      // persisted frame — the iterative operators' pinned intermediates
      // then drag `cpus` near-empty tasks into every consumer stage; at
      // cluster scale the same flag yields advisory-sized partitions)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.probeFixtures(spark, sfDir) // fail-loud fixture drift diagnosis
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failure before the overwrite executes leaves a PREVIOUS
        // run's parquet behind in a reused outDir — the compare would
        // then grade stale output green; a broken query must be absent,
        // not stale
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          val s = Files.walk(dir)
          try s.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
          finally s.close()
        }
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      VerifyJson.render(SparkEntry.oracleSql))
    // machine-readable split of "no oracle BY CONSTRUCTION" from "no
    // oracle by omission": a consumer tallying correctness should count
    // these as rows_only, not as errors (they are sketch-internal
    // results with hash-green exact twins — see SparkEntry.rowsOnly)
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      "{\"rows_only\": " + SparkEntry.rowsOnly.toSeq.sorted
        .map(VerifyJson.quote).mkString("[", ",", "]") + "}")
    spark.stop()
  }
}

/** Minimal JSON object rendering for oracle_sql.json. Extracted (and
  * round-trip-tested against Jackson in VerifyJsonSpec): a malformed
  * escape here would make the driver's json.load fail and silently zero
  * the round's correctness signal.
  */
object VerifyJson {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(m: Map[String, String]): String =
    m.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ",", "}")
}
