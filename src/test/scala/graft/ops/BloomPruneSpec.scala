package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Bloom-prune join invariants: exact parity with the plain join (false
 * positives die in the join), zero false negatives, real pruning power on
 * disjoint keys, and the probe staying a pre-join filter in the plan.
 */
class BloomPruneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val big = (1L to 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private val small = Seq((7L, "a"), (42L, "b"), (9999L, "c"), (7L, "dup"))
    .toDF("sk", "tag")

  test("bloomPruneJoin matches the plain join exactly (long keys)") {
    val pruned = Relational.bloomPruneJoin(big, small, "k", "sk",
      expectedItems = 16)
      .select("k", "payload", "tag")
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "payload", "tag")
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == 4) // keys 7 (×2 dim rows), 42, 9999
  }

  test("bloomPruneJoin matches the plain join exactly (string keys)") {
    val bigS = (1 to 2000).map(i => (s"id$i", i)).toDF("k", "v")
    val smallS = Seq(("id5", "x"), ("id1999", "y")).toDF("sk", "tag")
    val pruned = Relational.bloomPruneJoin(bigS, smallS, "k", "sk",
      expectedItems = 16).select("k", "v", "tag")
    val plain = bigS.join(smallS, bigS("k") === smallS("sk"))
      .select("k", "v", "tag")
    assert(pruned.collect().toSet == plain.collect().toSet)
  }

  test("no false negatives: every small-side key survives the prune") {
    val survivors = Relational.bloomPrune(big, small, "k", "sk",
      expectedItems = 16)
      .select("k").as[Long].collect().toSet
    assert(Set(7L, 42L, 9999L).subsetOf(survivors))
  }

  test("pruning power: disjoint big-side keys mostly dropped pre-join") {
    val disjointBig = (100000L to 110000L).map(i => Tuple1(i)).toDF("k")
    val survivors = Relational.bloomPrune(disjointBig, small, "k", "sk",
      expectedItems = 16, fpp = 0.01).count()
    // 10001 disjoint keys at 1% fpp: expect ~100 survivors; 10× slack.
    assert(survivors <= 1000, s"bloom pruned only down to $survivors rows")
  }

  test("null big-side keys are dropped, matching inner-join semantics") {
    val withNull = big.select(
      when(col("k") === 5L, lit(null).cast("long")).otherwise(col("k")).as("k"),
      col("payload"))
    val prunedCount = Relational.bloomPruneJoin(withNull, small, "k", "sk",
      expectedItems = 16).count()
    val plainCount = withNull.join(small, withNull("k") === small("sk")).count()
    assert(prunedCount == plainCount)
  }

  test("plan shape: bloom probe is a Filter BELOW the join, and parity holds with broadcast disabled (sort-merge path)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // A real file scan — over a LocalRelation, ConvertToLocalRelation
      // folds the probe into the scan driver-side and no Filter survives.
      val dir = java.nio.file.Files.createTempDirectory("bloom_plan").toString
      big.write.mode("overwrite").parquet(dir)
      val bigP = spark.read.parquet(dir)
      val joined = Relational.bloomPruneJoin(bigP, small, "k", "sk",
        expectedItems = 16)
      val plan: SparkPlan = joined.queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("bloom_might_contain"),
        s"probe missing from plan:\n$planStr")
      // The probe filter must sit under the join, not above it.
      val joinIdx = planStr.indexOf("Join")
      val probeIdx = planStr.indexOf("bloom_might_contain")
      assert(joinIdx >= 0 && probeIdx > joinIdx,
        "bloom probe should appear below (after, in tree print) the join")
      val plain = big.join(small, big("k") === small("sk"))
        .select("k", "payload", "tag")
      assert(joined.select("k", "payload", "tag").collect().toSet ==
        plain.collect().toSet)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
