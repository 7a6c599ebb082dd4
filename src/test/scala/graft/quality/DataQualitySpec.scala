package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Profiling stats, violation counts, quarantine split semantics. */
class DataQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val batch = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),    // negative value → range violation
    (3L, None, "ok"),          // null value → not-null violation
    (4L, Some(20.0), "")       // blank label → non-blank violation
  ).toDF("id", "value", "label")

  private val rules = Seq(
    DataQuality.Rule("value_not_null", col("value").isNotNull),
    DataQuality.Rule("value_non_negative", col("value") >= 0),
    DataQuality.Rule("label_non_blank", length(trim(col("label"))) > 0))

  test("profile computes count/null/distinct/min/max per column in one pass") {
    val p = DataQuality.profile(batch, Seq("id", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == (4L, 0L, 4L, "1", "4"))
    assert(p("value") == (3L, 1L, 3L, "-5.0", "20.0"))
  }

  test("approx-distinct profile avoids Expand and agrees on tiny cardinalities") {
    val exact = DataQuality.profile(batch, Seq("id", "value", "label"))
    val approx = DataQuality.profile(batch, Seq("id", "value", "label"),
      approxDistinct = true)
    assert(approx.collect().toSet == exact.collect().toSet) // HLL exact when tiny
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { approx.explain() }
    assert(!buf.toString("UTF-8").contains("Expand"),
      "approx profile must not plan an Expand")
  }

  test("violations counts each rule independently; null predicate = violation") {
    val v = DataQuality.violations(batch, rules)
      .as[(String, Long)].collect().toMap
    assert(v == Map(
      "value_not_null" -> 1L,
      "value_non_negative" -> 2L,  // the -5 row AND the null row (null fails range)
      "label_non_blank" -> 1L))
  }

  test("quarantine splits pass/fail and names the failed rules") {
    val (pass, quar) = DataQuality.quarantine(batch, rules)
    assert(pass.select("id").as[Long].collect().toSeq == Seq(1L))
    val q = quar.select(col("id"), col("failed_rules"))
      .as[(Long, Seq[String])].collect().toMap
    assert(q(2L) == Seq("value_non_negative"))
    assert(q(3L) == Seq("value_not_null", "value_non_negative"))
    assert(q(4L) == Seq("label_non_blank"))
    assert(pass.columns.toSeq == batch.columns.toSeq) // tag column dropped
  }

  test("winsorize clips both tails to the exact percentiles, interior untouched") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val w = DataQuality.winsorize(df, "v", pLow = 0.1, pHigh = 0.9)
      .select("id", "winsorized").as[(Long, Double)].collect().toMap
    // p10 of 1..100 (interpolated) = 10.9, p90 = 90.1
    assert(w(1L) == 10.9 && w(5L) == 10.9)    // low tail clipped up
    assert(w(100L) == 90.1 && w(95L) == 90.1) // high tail clipped down
    assert(w(50L) == 50.0)                    // interior unchanged
  }

  test("robustOutliers flags the planted spike and nothing else") {
    // group a: tight cluster around 10 plus one spike; group b: constant
    val rows = (1L to 20L).map(i => (i, "a", 10.0 + (i % 5) * 0.1)) :+
      (21L, "a", 500.0)
    val const = (22L to 30L).map(i => (i, "b", 7.0))
    val df = (rows ++ const).toDF("id", "grp", "v")
    val out = DataQuality.robustOutliers(df, "grp", "v")
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(21L))                                   // the spike flags
    assert((1L to 20L).forall(!out(_)))                // the cluster does not
    // MAD = 0 (constant group): null z, never flagged
    assert((22L to 30L).forall(!out(_)))
    val z = DataQuality.robustOutliers(df, "grp", "v")
      .filter($"grp" === "b").select("robust_z").collect()
    assert(z.forall(_.isNullAt(0)))
  }

  test("robustOutliers: median/MAD resist the outlier a mean/stddev gate lets through") {
    // one huge spike drags stddev so far that 3.5-sigma misses it only in
    // the classical gate — the robust gate must still flag it
    val df = ((1L to 30L).map(i => (i, "g", 100.0 + (i % 7))) :+
      (31L, "g", 1e6)).toDF("id", "grp", "v")
    val robust = DataQuality.robustOutliers(df, "grp", "v")
      .filter($"is_outlier").select("id").as[Long].collect().toSet
    assert(robust == Set(31L))
  }

  test("psiDrift: identical distributions score ~0, shifted ones don't") {
    val ref = (1 to 1000).map(i => i.toDouble).toDF("v")
    val same = (1 to 1000).map(i => i.toDouble).toDF("v")
    val shifted = (1 to 1000).map(i => i.toDouble + 700).toDF("v")

    def psi(cur: org.apache.spark.sql.DataFrame): Double =
      DataQuality.psiDrift(ref, cur, "v", nBins = 10)
        .agg(sum($"psi_term")).as[Double].head()

    assert(math.abs(psi(same)) < 1e-6)
    assert(psi(shifted) > 0.25, s"shift must register as drift, psi=${psi(shifted)}")
  }

  test("psiDrift: dense bins, empty bins smoothed (no NaN/Inf)") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = Seq(1.0, 2.0, 3.0).toDF("v") // most bins empty on the current side
    val rows = DataQuality.psiDrift(ref, cur, "v", nBins = 5)
      .orderBy($"bin").as[(Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (1 to 5))
    assert(rows.forall { case (_, _, _, t) => !t.isNaN && !t.isInfinite })
    assert(rows.map(_._2).sum == 100 && rows.map(_._3).sum == 3)
  }

  test("seasonalAnomalies: per-cell z, spike caught where a global z misses it") {
    // metric m: hour 0 sits near 10, hour 12 near 100. A value of 25 at
    // hour 0 is a wild anomaly for ITS cell but unremarkable globally
    // (global mean ≈ 55) — the reason for seasonal profiling.
    val base = (1 to 40).flatMap { i =>
      Seq((i.toLong, "m", 0, 10.0 + (i % 5) * 0.1),
        (100L + i, "m", 12, 100.0 + (i % 5) * 0.1))
    }
    val rows = (base :+ ((999L, "m", 0, 25.0))).toDF("id", "grp", "h", "v")
    val flagged = DataQuality.seasonalAnomalies(rows, "grp", col("h"), "v",
        zThreshold = 3.0)
      .select("id", "z").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(flagged.keySet == Set(999L), s"only the hour-0 spike flags: $flagged")
    assert(flagged(999L) > 3.0)
    // a single-point cell never flags (its own mean; sd undefined)
    val single = rows.union(Seq((777L, "m", 5, 1e9)).toDF("id", "grp", "h", "v"))
    assert(DataQuality.seasonalAnomalies(single, "grp", col("h"), "v", 3.0)
      .select("id").as[Long].collect().toSet == Set(999L))
  }
}
