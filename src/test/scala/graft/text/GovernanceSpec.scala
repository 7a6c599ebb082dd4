package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PII redaction chain order, profile counts, keyed pseudonymization. */
class GovernanceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val leaky =
    "Call +1 (555) 010-4242 or mail bob@corp.example.com; " +
      "server 192.168.7.12, card 4111 1111 1111 1111, see https://x.example/a?b=1 end"

  test("redactPii removes every class; chain order protects IPs from the phone regex") {
    val out = Seq(leaky).toDF("t")
      .select(Governance.redactPii(col("t")).as("r")).as[String].head()
    assert(out == "Call [PHONE] or mail [EMAIL]; server [IP], card [CARD], see [URL] end",
      s"got: $out")
    // the dotted quad must be [IP], not a half-eaten [PHONE]
    assert(!out.contains("[PHONE]."))
  }

  test("piiProfile counts each class per row in one projection") {
    val rows = Seq(
      (1L, leaky),
      (2L, "clean text, nothing to see"),
      (3L, "two mails: a@b.example and c@d.example"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val p = Governance.piiProfile(rows, "id", "t")
      .orderBy("id")
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq
    assert(p == Seq(
      (1L, 1, 1, 1, 1, 1),
      (2L, 0, 0, 0, 0, 0),
      (3L, 0, 0, 0, 2, 0),
      (4L, 0, 0, 0, 0, 0))) // null text profiles as zero hits, never null
    assert(!p.head.productIterator.exists(_ == null))
  }

  test("pseudonymize is deterministic, key-rotating, null-safe, join-preserving") {
    val names = Seq(Some("alice"), Some("bob"), Some("alice"), None).toDF("name")
    val t1 = names.select(Governance.pseudonymize(col("name"), "k1").as("p"))
      .as[Option[String]].collect().toSeq
    val t2 = names.select(Governance.pseudonymize(col("name"), "k1").as("p"))
      .as[Option[String]].collect().toSeq
    val rot = names.select(Governance.pseudonymize(col("name"), "k2").as("p"))
      .as[Option[String]].collect().toSeq
    assert(t1 == t2)                       // pure function of (key, value)
    assert(t1.head == t1(2))               // same value → same token (joins survive)
    assert(t1.head != t1(1))               // distinct values stay distinct
    assert(t1 != rot)                      // key rotation unlinks
    assert(t1(3).isEmpty)                  // null in → null out
    assert(t1.flatten.forall(_.length == 16))
    // group-by cardinality is preserved through anonymization
    val before = names.filter(col("name").isNotNull).select("name").distinct().count()
    val after = names.filter(col("name").isNotNull)
      .select(Governance.pseudonymize(col("name"), "k1").as("p")).distinct().count()
    assert(before == after)
  }

  test("kAnonymity flags small groups; suppressBelowK removes exactly them") {
    val rows = Seq(
      ("a", 1, "r1"), ("a", 1, "r2"), ("a", 1, "r3"), // group of 3: safe at k=3
      ("a", 2, "r4"), ("a", 2, "r5"),                 // group of 2: at risk
      ("b", 1, "r6")                                  // singleton: at risk
    ).toDF("seg", "band", "payload")
    val audit = Governance.kAnonymity(rows, Seq("seg", "band"), k = 3)
      .as[(String, Int, Long, Boolean)].collect().toSet
    assert(audit == Set(("a", 1, 3L, false), ("a", 2, 2L, true), ("b", 1, 1L, true)))
    val kept = Governance.suppressBelowK(rows, Seq("seg", "band"), k = 3)
      .select("payload").as[String].collect().toSet
    assert(kept == Set("r1", "r2", "r3"))
    // suppression preserves the schema (semi-join, not a projection)
    assert(Governance.suppressBelowK(rows, Seq("seg", "band"), 3).columns.toSeq
      == rows.columns.toSeq)
  }

  test("dpCounts/dpSum: deterministic per (salt, group), scale tracks 1/epsilon, clip bounds the sum") {
    val rows = Seq(
      ("a", 10.0), ("a", 50.0), ("a", 500.0), // 500 clips to 100
      ("b", -3.0),                            // negative clips to 0
      ("b", 20.0)
    ).toDF("grp", "v")
    def counts(eps: Double, salt: String = "dp") =
      Governance.dpCounts(rows, "grp", eps, salt)
        .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // reruns reproduce the release exactly (the repeated-release property)
    assert(counts(1.0) == counts(1.0))
    // a different salt is a different query → different draw
    assert(counts(1.0).values.map(_._3).toSet
      != counts(1.0, salt = "dp2").values.map(_._3).toSet)
    // noise scales as 1/eps: the deviation from the true count at eps=0.1
    // is exactly 10x the deviation at eps=1.0 (same uniform, same sign)
    val e1 = counts(1.0); val e01 = counts(0.1)
    for (g <- Seq("a", "b")) {
      val d1 = e1(g)._3 - e1(g)._2
      val d01 = e01(g)._3 - e01(g)._2
      // both releases are rounded to 6 dp, and 10*d1 amplifies d1's
      // rounding by 10 — the relation holds to ~5e-6, not machine epsilon
      assert(math.abs(d01 - 10 * d1) < 1e-5, s"group $g: $d01 vs 10*$d1")
    }
    // clipping: group a's clipped_sum is 10+50+100, b's is 0+20
    val sums = Governance.dpSum(rows, "grp", "v", clip = 100.0, epsilon = 1.0)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(sums("a")._2 == 160.0 && sums("b")._2 == 20.0)
    // noisy release differs from the clipped truth (noise actually applied)
    assert(sums("a")._3 != sums("a")._2)
  }
}
