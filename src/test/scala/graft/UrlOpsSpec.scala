package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization / domain curation: literal expectations for every
  * normalizeUrl branch, eTLD+1 extraction, cap + blocklist behavior. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u"))).as[String].collect().toSeq

  test("normalizeUrl: case, default ports, params, fragment, path") {
    assert(norm("HTTPS://WWW.Example.COM:443/A/b/?z=1&a=2#frag") ==
      Seq("https://www.example.com/A/b?a=2&z=1"))
    // http default port stripped; https port on http scheme kept
    assert(norm("HTTP://x.com:80/p", "http://x.com:443/p") ==
      Seq("http://x.com/p", "http://x.com:443/p"))
    // non-default port survives
    assert(norm("https://x.com:8080/") == Seq("https://x.com:8080/"))
    // empty path roots to '/'; trailing slashes trimmed elsewhere
    assert(norm("https://x.com", "https://x.com/a///") ==
      Seq("https://x.com/", "https://x.com/a"))
    // tracking params dropped, empties dropped, survivors sorted
    assert(norm("https://x.com/p?utm_source=s&b=2&&a=1&gclid=g&fbclid=f") ==
      Seq("https://x.com/p?a=1&b=2"))
    // all params tracking -> no query at all
    assert(norm("https://x.com/p?utm_campaign=c#s") == Seq("https://x.com/p"))
  }

  test("host and registered domain (eTLD+1, two-level suffixes)") {
    val rows = Seq(
      "https://WWW.News.Example.CO.UK:443/x",
      "http://blog.example.com/x",
      "https://a.b.example.org:8080/x",
      "http://localhost/x").toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"), UrlOps.urlDomain(col("u")).as("d"))
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("www.news.example.co.uk", "example.co.uk"),
      ("blog.example.com", "example.com"),
      ("a.b.example.org", "example.org"),
      ("localhost", "")))
  }

  test("perDomainCap bounds every domain; blocklist drops by eTLD+1") {
    val df = (1L to 40L).map { i =>
      val host = if (i % 2 == 0) "a.example.com" else s"b$i.example.org"
      (i, s"https://$host/p$i")
    }.toDF("id", "url")
    val capped = UrlOps.perDomainCap(df, "url", "id", cap = 5)
    val byDom = capped.groupBy(UrlOps.urlDomain(col("url")).as("d"))
      .count().as[(String, Long)].collect().toMap
    assert(byDom("example.com") == 5)   // 20 rows capped to 5
    assert(byDom("example.org") == 5)   // subdomains share the eTLD+1 cap
    // cap choice is the stable md5 order — rerun is identical
    assert(capped.select("id").as[Long].collect().toSet ==
      UrlOps.perDomainCap(df, "url", "id", cap = 5)
        .select("id").as[Long].collect().toSet)
    val kept = UrlOps.filterBlockedDomains(df, "url", Seq("example.org"))
    assert(kept.count() == 20 &&
      kept.select(UrlOps.urlDomain(col("url"))).distinct().as[String]
        .collect().toSeq == Seq("example.com"))
    assertThrows[IllegalArgumentException](
      UrlOps.perDomainCap(df, "url", "id", cap = 0))
  }

  test("normalizeUrl stays a single narrow Project (no shuffle, no UDF)") {
    val df = Seq("https://x.com/p?b=2&a=1").toDF("u")
      .select(UrlOps.normalizeUrl(col("u")).as("url"),
        UrlOps.urlDomain(col("u")).as("domain"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
