package graft

import org.scalatest.funsuite.AnyFunSuite

/** oracle_sql.json rendering must survive any SQL text the builder
  * writes — a bad escape would zero the round's correctness signal.
  * Round-trip through Jackson (the JSON parser on Spark's classpath).
  */
class VerifyJsonSpec extends AnyFunSuite {

  private def parse(json: String): Map[String, String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val it = node.fields()
    val out = scala.collection.mutable.Map.empty[String, String]
    while (it.hasNext) { val e = it.next(); out(e.getKey) = e.getValue.asText() }
    out.toMap
  }

  test("control characters, quotes and backslashes round-trip") {
    val nasty = Map(
      "q1" -> "SELECT 'a\nb' AS x,\t'c\rd'",
      "q2" -> "SELECT '\\' AS backslash, '\"quoted\"'",
      "q3" -> ("weird " + '' + '' + " chars"),
      "q4" -> "plain sql")
    assert(parse(VerifyJson.render(nasty)) == nasty)
  }

  test("the real oracleSql map renders to parseable JSON with every key") {
    val parsed = parse(VerifyJson.render(SparkEntry.oracleSql))
    assert(parsed.keySet == SparkEntry.oracleSql.keySet)
    assert(parsed == SparkEntry.oracleSql)
  }

  test("rowsOnly is exactly the set of queries without an oracle") {
    // every declared query is either DuckDB-hash-checked or explicitly
    // rows-only BY CONSTRUCTION — a new query with a forgotten oracle
    // must fail here instead of shipping unchecked
    val noOracle = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(noOracle == SparkEntry.rowsOnly,
      s"undeclared oracle-less queries: ${noOracle.diff(SparkEntry.rowsOnly)}; " +
        s"stale rowsOnly entries: ${SparkEntry.rowsOnly.diff(noOracle)}")
    // and rows-only entries still are real queries
    assert(SparkEntry.rowsOnly.subsetOf(SparkEntry.queries.keySet))
  }
}
