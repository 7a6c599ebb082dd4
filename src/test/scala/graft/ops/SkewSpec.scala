package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * AQE skew handling: with skew-join thresholds tuned down, a pathological
 * hot key gets its partition split at runtime (the `skew=true` marker on
 * the executed SMJ) and the join result is exactly the naive result — the
 * no-code-change complement to `Relational.saltedJoin`.
 */
class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition; result matches the unskewed plan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 50k rows on ONE key + a sprinkle of others; right side small per key
      val left = spark.range(50000).select(lit("hot").as("k"), col("id").as("v"))
        .union(spark.range(100).select(concat(lit("c"), col("id")).as("k"), col("id").as("v")))
      val right = Seq(("hot", 1.0), ("c1", 2.0), ("c2", 3.0)).toDF("k", "w")

      val joined = left.join(right, "k")
      // collect() finalizes THIS frame's AdaptiveSparkPlan (count() would
      // spawn a separate query execution and leave this one un-finalized)
      val n = joined.collect().length
      assert(n == 50002)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split marker in executed plan:\n${plan.take(3000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
