package graft.store

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Per-file KLL quantile sketch sidecars ([[Snapshots.writeQuantileSidecars]]
 * / [[Snapshots.approxQuantiles]]) — the quantile sibling of the NDV
 * sidecars. Pins the zero-data-IO covered read, the hybrid delta scan, MoR
 * delete coverage (estimate over LIVE rows only), per-column incremental
 * builds, the type matrix (numeric + timestamp canon, strings refused at
 * build), and rank accuracy on a known distribution.
 */
class QuantileSidecarSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def recordsReadDuring(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L; var n = 0
      while (n < 100 && prev != recs.get()) { prev = recs.get(); Thread.sleep(20); n += 1 }
    } finally spark.sparkContext.removeSparkListener(l)
    recs.get()
  }

  test("covered estimate reads ZERO data records; ranks accurate on uniform data") {
    val base = java.nio.file.Files.createTempDirectory("graft-kll1").toString + "/t"
    Snapshots.write((1L to 10000L).map(i => (i, i.toDouble)).toDF("id", "v")
      .repartition(4), base, statsKey = Some("id"))
    assert(Snapshots.writeQuantileSidecars(spark, base, Seq("v")) == 4)
    // idempotent: nothing left to build
    assert(Snapshots.writeQuantileSidecars(spark, base, Seq("v")) == 0)
    var got: Seq[Double] = Seq.empty
    val read = recordsReadDuring {
      got = Snapshots.approxQuantiles(spark, base, "v", Seq(0.1, 0.5, 0.99))
    }
    assert(read == 0L, s"covered quantiles must not read data, read $read")
    assert(got.size == 3)
    // uniform 1..10000 with k=1000: well within 2% rank error
    assert(math.abs(got(0) - 1000.0) <= 200.0, s"p10 ${got(0)}")
    assert(math.abs(got(1) - 5000.0) <= 200.0, s"p50 ${got(1)}")
    assert(math.abs(got(2) - 9900.0) <= 200.0, s"p99 ${got(2)}")
  }

  test("hybrid: a fresh append re-scans only the delta; estimate covers it") {
    val base = java.nio.file.Files.createTempDirectory("graft-kll2").toString + "/t"
    Snapshots.write((1L to 5000L).map(i => (i, 10.0)).toDF("id", "v")
      .repartition(4), base, statsKey = Some("id"))
    Snapshots.writeQuantileSidecars(spark, base, Seq("v"))
    // the delta carries a much larger value mass that MUST move p90
    Snapshots.append((1L to 2000L).map(i => (10000L + i, 1000.0)).toDF("id", "v"), base)
    var got: Seq[Double] = Seq.empty
    val read = recordsReadDuring {
      got = Snapshots.approxQuantiles(spark, base, "v", Seq(0.5, 0.9))
    }
    assert(read <= 2200L, s"only the 2000-row delta may re-scan, read $read")
    assert(got(0) == 10.0 && got(1) == 1000.0,
      s"estimate must cover the un-sidecar'd delta: $got")
  }

  test("MoR delete coverage: estimate is over LIVE rows; covered file re-scans") {
    val base = java.nio.file.Files.createTempDirectory("graft-kll3").toString + "/t"
    // low file [1..100] value 1.0, high file [101..200] value 100.0
    Snapshots.write(
      (1L to 200L).map(i => (i, if (i <= 100) 1.0 else 100.0)).toDF("id", "v")
        .repartitionByRange(2, col("id")),
      base, statsKey = Some("id"))
    Snapshots.writeQuantileSidecars(spark, base, Seq("v"))
    // retire every high row merge-on-read: p90 must fall back to 1.0
    Snapshots.deleteWhereMoR(spark, base, col("id") > 100L)
    val got = Snapshots.approxQuantiles(spark, base, "v", Seq(0.9))
    assert(got == Seq(1.0), s"deleted rows must not count: $got")
  }

  test("type matrix: timestamp canon (epoch micros), string build refused, per-column incremental") {
    val base = java.nio.file.Files.createTempDirectory("graft-kll4").toString + "/t"
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    Snapshots.write((1L to 100L).map { i =>
      (i, new java.sql.Timestamp(t0.getTime + i * 1000L), s"s$i")
    }.toDF("id", "ts", "s").coalesce(1), base)
    // strings are skipped (no quantile measure), numerics + ts build
    assert(Snapshots.writeQuantileSidecars(spark, base, Seq("s")) == 0)
    assert(Snapshots.writeQuantileSidecars(spark, base, Seq("ts")) == 1)
    // per-column incremental: adding id only re-reads for id
    assert(Snapshots.writeQuantileSidecars(spark, base, Seq("id", "ts")) == 1)
    val Seq(p50) = Snapshots.approxQuantiles(spark, base, "ts", Seq(0.5))
    val expectMicros = (t0.getTime + 50L * 1000L) * 1000.0
    assert(math.abs(p50 - expectMicros) <= 5L * 1000L * 1000L,
      s"ts p50 in epoch micros: $p50 vs $expectMicros")
  }
}
