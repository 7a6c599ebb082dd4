package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** URL host extraction + subdomain-aware blocklisting, both join forms. */
class WebSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val urls = Seq(
    (1L, "https://ads.example.com/x"),      // subdomain of blocked
    (2L, "https://example.com/y"),          // exactly blocked
    (3L, "https://example.org/z"),          // fine
    (4L, "http://sub.deep.tracker.net:8080/p"), // deep subdomain + port of blocked
    (5L, "not a url at all"),               // unparseable → never blocked
    (6L, "https://notexample.com/q")        // suffix of the NAME, not the DOMAIN
  ).toDF("id", "url")

  test("domainOf extracts lowercased host, null on junk") {
    val d = urls.select(col("id"), Web.domainOf(col("url")).as("d"))
      .as[(Long, Option[String])].collect().toMap
    assert(d(1L).contains("ads.example.com"))
    assert(d(4L).contains("sub.deep.tracker.net")) // port is stripped with the path
    assert(d(5L).isEmpty)
  }

  test("domainSuffixes builds the parent chain") {
    val s = spark.sql("SELECT 1")
      .select(Web.domainSuffixes(lit("a.b.c")).as("s")).as[Seq[String]].head()
    assert(s == Seq("a.b.c", "b.c", "c"))
  }

  test("blockByDomain: blocks domain + subdomains via equi joins, keeps the rest") {
    val blocklist = Seq("example.com", "tracker.net").toDF("domain")
    val kept = Web.blockByDomain(urls, "id", col("url"), blocklist)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 6L))
    // the plan must stay in hash-join land — no nested-loop suffix matching
    val plan = Web.blockByDomain(urls, "id", col("url"), blocklist)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("blockByDomainSet: same result as the join form, zero Exchange") {
    val kept = Web.blockByDomainSet(urls, col("url"),
        Seq("example.com", "tracker.net"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L, 6L))
    val plan = Web.blockByDomainSet(urls, col("url"), Seq("example.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("canonicalizeUrl: case, port, fragment, tracking params, slash") {
    val cases = Seq(
      // authority lowercased, default port stripped, path case kept
      ("HTTPS://WWW.Example.COM:443/Docs/A", "https://www.example.com/Docs/A"),
      (("http://x.com:80/p"), "http://x.com/p"),
      // non-default port survives
      ("http://x.com:8080/p", "http://x.com:8080/p"),
      // a default port of the OTHER scheme is not default here — it names
      // a different resource and must survive
      ("http://x.com:443/p", "http://x.com:443/p"),
      ("https://x.com:80/p", "https://x.com:80/p"),
      // fragment dropped
      ("https://x.com/p#section-2", "https://x.com/p"),
      // tracking params stripped wherever they sit; separators repaired
      ("https://x.com/p?utm_source=a&id=1&utm_campaign=b", "https://x.com/p?id=1"),
      ("https://x.com/p?id=1&fbclid=XYZ", "https://x.com/p?id=1"),
      ("https://x.com/p?utm_medium=m", "https://x.com/p"),
      // trailing slash collapsed, also before a query string
      ("https://x.com/docs/", "https://x.com/docs"),
      ("https://x.com/docs/?id=2", "https://x.com/docs?id=2"),
      ("https://x.com/", "https://x.com"))
    val out = cases.map(_._1).toDF("url")
      .select(Web.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"canonicalizeUrl($in) = $got, want $want")
    }
  }

  test("canonicalizeUrl is idempotent") {
    val messy = Seq("HTTPS://A.B:443/x/?utm_source=s&q=1#f",
      "http://c.d/e?gclid=g&r=2&utm_x=y")
    val once = messy.toDF("url")
      .select(Web.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    val twice = once.toSeq.toDF("url")
      .select(Web.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }
}
