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
}
