package graft

import org.apache.spark.sql.functions._

import graft.sample.Sampling

/** Per-domain cap: URL canonicalization must unify the messy variants a
  * real crawl produces, the quota must bind per canonical domain with
  * deterministic md5-rank selection, and the window must prune map-side
  * (WindowGroupLimit) so a mega-domain never shuffles its full mass.
  */
class DomainCapSpec extends SparkSpec {

  import spark.implicits._

  test("canonicalization unifies scheme/case/www/port/path/query variants") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM/a/b?q=1#f",
      "http://example.com:8080/c",
      "example.com/d",
      "  https://www.EXAMPLE.com  ",
      "ftp://www.example.com/e").toDF("url")
    val domains = urls.select(Sampling.canonicalDomain(col("url")).as("d"))
      .distinct().as[String].collect()
    assert(domains.toSeq == Seq("example.com"), domains.toSeq.toString)
  }

  test("subdomains stay distinct; only a LEADING www is stripped") {
    val urls = Seq("https://blog.example.com/x", "https://www.blog.example.com/x",
      "https://wwwx.example.com/x").toDF("url")
    val domains = urls.select(Sampling.canonicalDomain(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(domains == Seq("blog.example.com", "blog.example.com", "wwwx.example.com"))
  }

  test("cap binds per domain; selection is the md5-rank prefix; under-cap domains keep all") {
    val docs = (0 until 40).map { i =>
      val host = if (i < 30) "big.example.com" else s"small$i.example.com"
      (i.toLong, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val out = Sampling.domainCap(docs, col("url"), col("doc_id"), n = 4)
    val byDomain = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDomain("big.example.com") == 4L)
    assert(byDomain.size == 11 && byDomain.values.sum == 14L)
    // deterministic: the kept set for the big domain is the md5-ordered prefix
    val kept = out.filter(col("domain") === "big.example.com")
      .select("doc_id").as[Long].collect().toSet
    val expected = (0 until 30).map(_.toLong)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
      .take(4).toSet
    assert(kept == expected)
  }

  test("driver query plan: WindowGroupLimit prunes map-side before the domain shuffle") {
    val df = SparkEntry.queries("sample_domain_cap")(spark, Sf0001)
    df.write.format("noop").mode("overwrite").save()
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val limits = helper.collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(limits.nonEmpty, "rn <= n must trigger InferWindowGroupLimit")
  }
}
